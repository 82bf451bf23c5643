"""Hash-table encoder core op: multi-level gather forward + scatter backward.

The reference's NGP example leans on tcnn's fused hash-grid CUDA kernel
(``examples/radiance_fields/ngp.py:108-126``): forward is a per-thread
gather, backward a global-memory ``atomicAdd`` scatter.

TPU design (round-3 measurements, ``docs/benchmarks.md`` and
``scripts/bench_hash.py`` on v5e):

  * **Forward**: XLA's 1-D dynamic gather runs at ~0.4-0.5 ns/element —
    not the ~9 ns/element assumed in rounds 1-2 (that figure came from a
    layout-poisoned variant). Two per-feature 1-D gathers over a flat
    ``(L*T,)`` table column keep every intermediate on a lane-friendly
    ``(N, L*8)`` layout (a ``(N, L, 8, F)`` row gather pads its minor
    dims 64x — a measured 19 GB HBM OOM at bench scale).
  * **Backward**: XLA lowers scatter-add on TPU via *sort + segmented
    reduce* (visible in the HLO). Measured: one flat (33.5M,)->(8.4M,)
    f32 scatter-add = 39 ms, and **two scatters sharing the same indices
    cost the same 39 ms total** (XLA batches them into one variadic
    sort). A hand-rolled sort1x + cumsum-diff pipeline measured 51 ms —
    XLA's own lowering wins. The round-2 serial Pallas VMEM-RMW kernel
    measured ~1000x slower (23.8k samples/s end to end); it survives
    below as an opt-in (``pallas_scatter=True``) for tiny batches and as
    the measured before/after reference, with its padding fixed to
    accept any batch size.

Speed-of-light note: the scatter *is* a sort on this hardware — there is
no vectorized scatter primitive (Pallas VMEM writes are contiguous-slice
only, so any scatter decomposes to serial row RMW), and an MXU one-hot
formulation needs 2*T*F FLOPs per corner (~2 MFLOP at T=2^19) — orders
over budget. XLA's fused sort-scatter is therefore the practical floor;
the full encoder fwd+grad measures ~1.1 ns per gathered element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
PACK = LANES // 2  # 64 (entry, feature-pair) slots per 128-lane row
BLK = 4096  # corners per program (SMEM idx block: 16 KB int32)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _scatter_kernel(idx_ref, v_ref, out_ref, *, n_corners):
    """Accumulate ``v[i] (2,)`` into packed ``out[idx[i]]`` serially.

    idx_ref: SMEM (BLK,) int32 entry indices into the level's table
        (-1 = padding, skipped).
    v_ref: VMEM (BLK // PACK, 128) f32 — corner i's (v0, v1) lives at
        row i // 64, lanes (2*(i%64), 2*(i%64)+1).
    out_ref: VMEM (T // PACK, 128) f32 packed accumulator (revisited
        across the batch grid dimension; zeroed by the first program).
    """
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def body(i, _):
        idx = idx_ref[i]

        @pl.when(idx >= 0)
        def _():
            # extract (v0, v1) from the packed value row
            vrow = v_ref[i // PACK, :][None, :]  # (1, 128)
            vlane = 2 * (i % PACK)
            v0 = jnp.sum(jnp.where(lanes == vlane, vrow, 0.0))
            v1 = jnp.sum(jnp.where(lanes == vlane + 1, vrow, 0.0))
            # masked RMW on the accumulator row holding entry `idx`
            row = idx // PACK
            olane = 2 * (idx % PACK)
            orow = out_ref[row, :][None, :]
            upd = jnp.where(
                lanes == olane, orow + v0,
                jnp.where(lanes == olane + 1, orow + v1, orow),
            )
            out_ref[row, :] = upd[0]

        return 0

    jax.lax.fori_loop(0, n_corners, body, 0)


def hash_grad_scatter(
    idx: jnp.ndarray, values: jnp.ndarray, n_entries: int
) -> jnp.ndarray:
    """Scatter-add ``values`` (B, 2) f32 at ``idx`` (B,) int32 into a
    zero-initialized (n_entries, 2) table — Pallas VMEM formulation of
    ``jnp.zeros((T, 2)).at[idx].add(values)``.

    ``idx`` entries < 0 are skipped (used for batch padding). ``B`` may be
    arbitrary; both operands are padded here (once) to the kernel's block
    size. ``n_entries`` must be a multiple of 64 (hash tables are powers
    of 2).

    NOTE measured on v5e (round 3): the serial VMEM RMW loop is ~1000x
    slower than XLA's sort-based scatter-add at training batch sizes.
    This kernel is kept as the opt-in/reference implementation only.
    """
    B = idx.shape[0]
    pad = (-B) % BLK
    if pad:
        values = jnp.concatenate(
            [values, jnp.zeros((pad, 2), values.dtype)]
        )
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
    v_packed = values.astype(jnp.float32).reshape(-1, LANES)
    return hash_grad_scatter_packed(idx, v_packed, n_entries)


def hash_grad_scatter_packed(
    idx: jnp.ndarray, v_packed: jnp.ndarray, n_entries: int
) -> jnp.ndarray:
    """:func:`hash_grad_scatter` with the values already lane-packed:
    ``v_packed (B // 64, 128)`` f32 where corner ``i``'s feature pair
    lives at row ``i // 64``, lanes ``(2 * (i % 64), 2 * (i % 64) + 1)``.

    ``idx`` must be a multiple of ``BLK`` long OR consistent with
    ``v_packed`` (``len(idx) == v_packed.shape[0] * 64``); any remaining
    block padding is applied here to both operands together.
    """
    assert n_entries % PACK == 0
    B = idx.shape[0]
    assert v_packed.shape[0] * PACK == B, (
        f"idx ({B}) and v_packed ({v_packed.shape[0]} rows) disagree"
    )
    pad = (-B) % BLK
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
        v_packed = jnp.concatenate(
            [v_packed, jnp.zeros((pad // PACK, LANES), v_packed.dtype)]
        )
    Bp = idx.shape[0]
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, n_corners=BLK),
        grid=(Bp // BLK,),
        in_specs=[
            pl.BlockSpec(
                (BLK,), lambda b: (b,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (BLK // PACK, LANES),
                lambda b: (b, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_entries // PACK, LANES),
            lambda b: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_entries // PACK, LANES), jnp.float32
        ),
        interpret=_use_interpret(),
    )(idx.astype(jnp.int32), v_packed)
    return out.reshape(n_entries, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def hash_encode_lookup(
    table, flat_idx, corner_w, n_entries_per_level, pallas_scatter=False,
    packed_gather=True,
):
    """Multi-level hash-table lookup + trilinear blend, with a custom
    backward that produces ONLY the table gradient.

    Args:
        table: (2 * L * T,) f32 FLAT feature-major tables: ``[:L*T]`` is
            feature 0 of all levels, ``[L*T:]`` feature 1 (T entries per
            level). 1-D on purpose: a ``(L*T, 2)`` parameter tiles its
            trailing dims to (8, 128) on TPU — the 67 MB table becomes a
            4.3 GB resident array, and its adam moments another 8.6 GB
            (the round-3 first-bench 4 s/step was table-layout traffic,
            traced). A 1-D array is tiled T(1024) with zero padding.
        flat_idx: (N, L * 8) int32 lane-packed indices into ``table``
            (level offsets already added; level l's corners at lanes
            ``l * 8 .. l * 8 + 8``). Lane-packed rather than (N, L, 8):
            a trailing dim of 8 tiles up to 128 lanes (16x HBM), which
            at bench scale (N = 786k) was a measured multi-GB OOM.
        corner_w: (N, L * 8) f32 trilinear corner weights, same packing.
        n_entries_per_level: static T.
        pallas_scatter: use the serial Pallas VMEM scatter for the table
            gradient instead of XLA's sort-based scatter-add. Measured
            ~1000x slower at training scale — opt-in for tiny batches /
            kernel-equivalence tests only.
        packed_gather: gather bf16-packed feature pairs (one u32 gather
            instead of two f32 gathers — 2x fewer gathers on a
            gather-issue-bound op; tcnn-equivalent fp16-class table
            reads). False = full-f32 reads, two gathers.

    Returns:
        (N, 2 * L) f32 blended features, feature-major: columns
        ``[:L]`` are feature 0 of every level, ``[L:]`` feature 1.
        2-D on purpose: a ``(N, L, 2)`` output tile-pads its minor dims
        (2 -> 128 lanes, 64x HBM) and the relayout copies dominated the
        round-3 first on-chip run (5 s/step, traced); ``(N, 2L)`` is one
        clean (8, 128)-tiled array. Feature order is a fixed permutation
        of the reference's interleaved layout — downstream MLPs learn
        under any fixed order.

    The backward returns a ``float0``-style zero for ``flat_idx`` (int
    primal) and zeros for ``corner_w`` — sample positions are
    stop-gradient throughout this framework (sampling is
    non-differentiable), matching ``cp_encoder``'s convention. vs the
    reference: tcnn's encoder backward is the same table-only scatter
    (``atomicAdd`` per corner); positions get no gradient there either
    when the input is detached (the NGP example's usage).
    """
    L = flat_idx.shape[1] // 8
    n_features = table.shape[0] // (L * n_entries_per_level)
    return _lookup_fwd_impl(
        table, flat_idx, corner_w, packed_gather, n_features
    )


def _corner_sum_matrix(L: int) -> jnp.ndarray:
    """(L*8, L) 0/1 matrix summing each level's 8 corner columns.

    The 8-corner reduction as an MXU matmul: ``reshape(N, L, 8).sum(-1)``
    materializes a 3-D intermediate whose (L, 8) minor dims tile-pad to
    (L, 128) — 16x HBM + a relayout copy at bench scale (traced, round
    3). ``(N, L*8) @ (L*8, L)`` stays on clean 2-D tiles end to end.
    """
    cols = jnp.arange(L * 8) // 8
    return (cols[:, None] == jnp.arange(L)[None, :]).astype(jnp.float32)


def _pack_pair(f0, f1):
    """Two (M,) f32 feature columns -> (M,) u32 of packed bf16 pairs."""
    hi = jax.lax.shift_left(
        jax.lax.bitcast_convert_type(
            f0.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32),
        jnp.uint32(16),
    )
    lo = jax.lax.bitcast_convert_type(
        f1.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return hi | lo


def _pack_table_u32(table):
    """(2*L*T,) f32 feature-major -> (L*T,) u32 of packed bf16 pairs.

    TPU has no per-lane gather unit: XLA's 1-D gather floor measures
    ~3 ns per index regardless of operand size/placement, so the encoder
    forward is gather-ISSUE-bound. Packing feature 0 (high 16 bits) and
    feature 1 (low) as bf16 halves one u32 entry HALVES the number of
    gathers — the single biggest lever left. bf16 table reads match
    tcnn's fp16-table precision model (its CUDA kernels read __half);
    the master parameter and the adam update stay f32.
    """
    LT = table.shape[0] // 2
    f0 = table[:LT].astype(jnp.bfloat16)
    f1 = table[LT:].astype(jnp.bfloat16)
    hi = jax.lax.shift_left(
        jax.lax.bitcast_convert_type(f0, jnp.uint16).astype(jnp.uint32),
        jnp.uint32(16),
    )
    lo = jax.lax.bitcast_convert_type(f1, jnp.uint16).astype(jnp.uint32)
    return hi | lo


def _unpack_u32(g):
    """(…,) u32 packed pairs -> two f32 arrays (feature 0, feature 1)."""
    hi = jax.lax.bitcast_convert_type(
        jax.lax.shift_right_logical(g, jnp.uint32(16)).astype(jnp.uint16),
        jnp.bfloat16,
    ).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        (g & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return hi, lo


def _lookup_fwd_impl(table, flat_idx, corner_w, packed_gather=True,
                     n_features=2):
    N, L8 = flat_idx.shape
    L = L8 // 8
    LT = table.shape[0] // n_features
    S = _corner_sum_matrix(L)
    if n_features == 4:
        # F=4 (round-5): two bf16-packed u32 gathers per corner over the
        # same index set — per FEATURE the gather count matches F=2, and
        # the backward's per-level sorts are shared by all 4 features,
        # so L=8/F=4 carries the full 32-feature capacity at HALF the
        # sort volume of L=16/F=2 (the backward is ~60% of encoder cost)
        packs = [
            _pack_pair(
                table[2 * p * LT:(2 * p + 1) * LT],
                table[(2 * p + 1) * LT:(2 * p + 2) * LT],
            )
            for p in range(2)
        ]
        flat_idx, corner_w, p0, p1 = jax.lax.optimization_barrier(
            (flat_idx, corner_w, packs[0], packs[1])
        )
        f0, f1 = _unpack_u32(p0[flat_idx])
        f2, f3 = _unpack_u32(p1[flat_idx])
        return jnp.concatenate(
            [
                jnp.dot(f * corner_w, S, preferred_element_type=jnp.float32)
                for f in (f0, f1, f2, f3)
            ],
            axis=1,
        )  # (N, 4L) feature-major
    if packed_gather == "per_level":
        # Round-5 experiment (VERDICT #1): the full-table u32 gather
        # measures ~8.7 ns/idx while PER-LEVEL-operand gathers measured
        # ~3.2 ns/idx (scripts/bench_hash.py primitives) — route the
        # forward through L gathers over (T,) slices, reusing the
        # backward's (L, 8N) transpose-reshape layout (major-dim slices,
        # no lane-padded intermediates). The two relayout transposes are
        # HBM-linear (~1 ms at bench scale) vs the hundreds of ms the
        # gather-rate delta is worth if it holds at stream scale.
        T = LT // L
        packed = _pack_table_u32(table.astype(jnp.float32))  # (L*T,) u32
        flat_idx, corner_w, packed = jax.lax.optimization_barrier(
            (flat_idx, corner_w, packed)
        )
        idx_l = flat_idx.T.reshape(L, 8 * N)
        off = jnp.arange(L, dtype=jnp.int32)[:, None] * jnp.int32(T)
        idx_l = idx_l - off  # [0, T) per level
        g_l = [
            jax.lax.dynamic_slice_in_dim(packed, level * T, T)[idx_l[level]]
            for level in range(L)
        ]
        g = jnp.stack(g_l).reshape(L * 8, N).T  # (N, L*8)
        f0, f1 = _unpack_u32(g)
    elif packed_gather:
        packed = _pack_table_u32(table.astype(jnp.float32))  # (L*T,) u32
        # fusion firewall: keep the (heavy, fused) index computation out
        # of the gather op so the gather keeps its native lowering and
        # the packed table build isn't re-fused per consumer
        flat_idx, corner_w, packed = jax.lax.optimization_barrier(
            (flat_idx, corner_w, packed)
        )
        g = packed[flat_idx]  # ONE (N, L*8) u32 gather, both features
        f0, f1 = _unpack_u32(g)
    else:
        tf = table.astype(jnp.float32)
        flat_idx, corner_w = jax.lax.optimization_barrier(
            (flat_idx, corner_w)
        )
        f0 = tf[:LT][flat_idx]
        f1 = tf[LT:][flat_idx]
    out0 = jnp.dot(f0 * corner_w, S, preferred_element_type=jnp.float32)
    out1 = jnp.dot(f1 * corner_w, S, preferred_element_type=jnp.float32)
    return jnp.concatenate([out0, out1], axis=1)  # (N, 2L)


def _lookup_fwd(
    table, flat_idx, corner_w, n_entries_per_level, pallas_scatter,
    packed_gather,
):
    L = flat_idx.shape[1] // 8
    n_features = table.shape[0] // (L * n_entries_per_level)
    out = _lookup_fwd_impl(
        table, flat_idx, corner_w, packed_gather, n_features
    )
    return out, (flat_idx, corner_w, table.shape)


def _bwd_xla(flat_idx, corner_w, g, table_shape):
    """Table gradient via PER-LEVEL scatter-adds (two features sharing
    each level's index set).

    Measured on v5e at bench scale (100.7M corners,
    ``scripts/bench_hash.py primitives``): XLA's sort-based scatter-add
    is LINEAR at ~6 ns/corner, and the shared-idx two-feature variadic
    batching only happens for the smaller per-level sorts — 16 x
    [6.3M -> 524k] x2 features = 688 ms vs 1187 ms for the two flat
    100.7M scatters (the round-3 first formulation; its "two scatters
    cost one" microbench figure did not reproduce at 100M). Per-level
    splitting is the measured-fastest exact table gradient.

    ``g`` is the (N, 2L) feature-major cotangent; the broadcast of each
    level's cotangent over its 8 corners is an MXU matmul with the
    transposed corner-sum matrix (2-D tiles only, no repeat/reshape).
    The per-level corner streams are carved out of ONE (L, 8N)
    transpose-reshape of the (N, L*8) arrays — major-dim slices, no
    lane-padded intermediates.
    """
    N, L8 = flat_idx.shape
    L = L8 // 8
    F = g.shape[1] // L  # feature count (2 default; 4 = round-5 config)
    LT = table_shape[0] // F
    T = LT // L
    St = _corner_sum_matrix(L).T  # (L, L*8)
    # same fusion firewall as the forward: a fused producer would get
    # input-fused into the scatter and serialize it
    vs = [
        (corner_w * jnp.dot(
            g[:, f * L:(f + 1) * L], St,
            preferred_element_type=jnp.float32,
        ))
        for f in range(F)
    ]
    barrier = jax.lax.optimization_barrier((flat_idx, *vs))
    idx, vs = barrier[0], barrier[1:]
    # (N, L*8) -> (L*8, N) -> (L, 8N): level l's corner stream is row l
    idx_l = idx.T.reshape(L, 8 * N)
    v_l = [v.T.reshape(L, 8 * N) for v in vs]
    off = jnp.arange(L, dtype=jnp.int32)[:, None] * jnp.int32(T)
    idx_l = idx_l - off  # strip the level offset -> [0, T)
    # all F per-level scatters share one index set and are issued
    # adjacently so XLA variadic-batches them into ONE sort per level
    # (measured for F=2; the F=4 config halves sort volume per feature)
    gs = [[] for _ in range(F)]
    for level in range(L):
        for f in range(F):
            gs[f].append(
                jnp.zeros((T,), jnp.float32).at[idx_l[level]].add(
                    v_l[f][level]
                )
            )
    return jnp.concatenate([x for f in range(F) for x in gs[f]])


def _bwd_pallas(flat_idx, corner_w, g, n_entries_per_level, table_shape):
    """Per-level Pallas VMEM scatter (opt-in; see module docstring)."""
    N, L8 = flat_idx.shape
    L = L8 // 8
    T = n_entries_per_level
    grads = []
    for level in range(L):
        sl = slice(level * 8, level * 8 + 8)
        idx_l = flat_idx[:, sl].reshape(-1) - level * T  # (N*8,)
        # corner cotangents v_f = w * g_f, built directly in the packed
        # (B // 64, 128) layout (interleaved feature pairs) — never a
        # (B, 2)-shaped tensor, whose tiled layout pads 64x. The corner
        # stream is padded to a PACK multiple first so any N works
        # (round-2 advisor finding: N % 8 != 0 crashed the reshape).
        v0 = (corner_w[:, sl] * g[:, level][:, None]).reshape(-1)
        v1 = (corner_w[:, sl] * g[:, L + level][:, None]).reshape(-1)
        B = idx_l.shape[0]
        pad = (-B) % PACK
        if pad:
            idx_l = jnp.concatenate(
                [idx_l, jnp.full((pad,), -1, jnp.int32)]
            )
            zeros = jnp.zeros((pad,), v0.dtype)
            v0 = jnp.concatenate([v0, zeros])
            v1 = jnp.concatenate([v1, zeros])
        v_packed = jnp.stack(
            [v0.reshape(-1, PACK), v1.reshape(-1, PACK)], axis=-1
        ).reshape(-1, LANES)
        grads.append(hash_grad_scatter_packed(idx_l, v_packed, T))
    # per-level (T, 2) kernel outputs -> the flat feature-major layout
    return jnp.concatenate(
        [jnp.concatenate([gr[:, f] for gr in grads]) for f in range(2)]
    )


def _lookup_bwd(n_entries_per_level, pallas_scatter, packed_gather, res, g):
    flat_idx, corner_w, table_shape = res
    g = g.astype(jnp.float32)
    if pallas_scatter:
        d_table = _bwd_pallas(
            flat_idx, corner_w, g, n_entries_per_level, table_shape
        )
    else:
        d_table = _bwd_xla(flat_idx, corner_w, g, table_shape)
    # int primal gets a float0 zero (JAX's convention for non-float
    # primals — cf. vol_rendering._int_zero_cotangent); corner_w is
    # stop-gradient by design.
    zero_idx = jax.custom_derivatives.zero_from_primal(
        flat_idx, symbolic_zeros=False
    )
    return (d_table, zero_idx, jnp.zeros_like(corner_w))


hash_encode_lookup.defvjp(_lookup_fwd, _lookup_bwd)
