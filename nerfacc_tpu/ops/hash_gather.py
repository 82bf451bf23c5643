"""Pallas TPU kernel: hash-table gradient scatter-accumulate in VMEM.

The reference's NGP example leans on tcnn's fused hash-grid CUDA kernel
(``examples/radiance_fields/ngp.py:108-126``): forward is a per-thread
gather, backward a global-memory ``atomicAdd`` scatter. On TPU the
forward gather is already at XLA's per-element floor (~9 ns/index on
v5e — see ``docs/benchmarks.md``), but XLA lowers the *backward*
(grad-of-gather) to an HBM scatter-add whose serialized index chains
cost 1-2 orders of magnitude more per element. That scatter is the
single reason "trainable gather-table encoders die in backward" on TPU.

This kernel attacks exactly that: one hash level's table gradient is a
4 MB f32 accumulator (T = 2^19 entries x 2 features, packed 64 entries
per 128-lane row) that fits VMEM, so the scatter becomes a serial
in-VMEM masked read-modify-write loop — no HBM round trip per corner,
no XLA scatter custom call. Layout:

  * indices arrive via scalar prefetch (SMEM) so the loop reads them in
    ~1 cycle each;
  * the (B, 2) corner values are packed 64-per-row into (B/64, 128)
    f32 so reads are full-lane; a one-hot mask extracts the pair;
  * each corner does: one (1, 128) row read, one masked add, one row
    write — ~10 VPU ops — against the VMEM-resident accumulator.

The level accumulators are grid-revisited blocks (same pattern as
``cp_encoder._bwd_kernel``): program (l, b) accumulates batch block b
into level l's block, which Mosaic keeps in VMEM across the inner grid
dimension.
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

    ``idx`` entries < 0 are skipped (used for batch padding).
    ``n_entries`` must be a multiple of 64 (hash tables are powers of 2).
    """
    B = idx.shape[0]
    # pack (B, 2) values into (B // 64, 128) rows. Callers with
    # lane-friendly inputs should build the packed layout themselves and
    # call :func:`hash_grad_scatter_packed` — a (B, 2) tensor's tiled
    # layout pads the minor dim 2 -> 128 (64x HBM) at large B.
    pad = (-B) % BLK
    if pad:
        values = jnp.concatenate(
            [values, jnp.zeros((pad, 2), values.dtype)]
        )
    v_packed = values.astype(jnp.float32).reshape(-1, LANES)
    return hash_grad_scatter_packed(idx, v_packed, n_entries)


def hash_grad_scatter_packed(
    idx: jnp.ndarray, v_packed: jnp.ndarray, n_entries: int
) -> jnp.ndarray:
    """:func:`hash_grad_scatter` with the values already lane-packed:
    ``v_packed (B // 64, 128)`` f32 where corner ``i``'s feature pair
    lives at row ``i // 64``, lanes ``(2 * (i % 64), 2 * (i % 64) + 1)``.
    """
    assert n_entries % PACK == 0
    B = idx.shape[0]
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hash_encode_lookup(table, flat_idx, corner_w, n_entries_per_level):
    """Multi-level hash-table lookup + trilinear blend with the Pallas
    scatter backward.

    Args:
        table: (L * T, 2) f32 flat per-level tables (T entries each).
        flat_idx: (N, L * 8) int32 lane-packed indices into ``table``
            (level offsets already added; level l's corners at lanes
            ``l * 8 .. l * 8 + 8``). Lane-packed rather than (N, L, 8):
            a trailing dim of 8 tiles up to 128 lanes (16x HBM), which
            at bench scale (N = 786k) was a measured multi-GB OOM.
        corner_w: (N, L * 8) f32 trilinear corner weights, same packing.
        n_entries_per_level: static T.

    Returns:
        (N, L, 2) f32 blended features.

    The forward runs one 1-D gather per feature column ((N, L*8)-shaped
    output, zero layout padding) instead of a single (N, L, 8, 2) row
    gather (64x lane padding on the trailing feature pair). The backward
    produces the table gradient via one VMEM-resident
    :func:`hash_grad_scatter_packed` per level (a level's 4 MB
    accumulator fits VMEM; the full 64 MB table does not) and **zero**
    cotangents for ``flat_idx``/``corner_w`` — sample positions are
    stop-gradient throughout this framework (sampling is
    non-differentiable), matching ``cp_encoder``'s convention.
    """
    return _lookup_fwd_impl(table, flat_idx, corner_w)


def _lookup_fwd_impl(table, flat_idx, corner_w):
    N, L8 = flat_idx.shape
    L = L8 // 8
    tf = table.astype(jnp.float32)
    # per-feature 1-D gathers: (N, L*8) outputs, perfectly lane-tiled
    f0 = (tf[:, 0][flat_idx] * corner_w).reshape(N, L, 8).sum(-1)
    f1 = (tf[:, 1][flat_idx] * corner_w).reshape(N, L, 8).sum(-1)
    return jnp.stack([f0, f1], axis=-1)  # (N, L, 2)


def _lookup_fwd(table, flat_idx, corner_w, n_entries_per_level):
    out = _lookup_fwd_impl(table, flat_idx, corner_w)
    return out, (flat_idx, corner_w, table.shape)


def _lookup_bwd(n_entries_per_level, res, g):
    flat_idx, corner_w, table_shape = res
    N, L8 = flat_idx.shape
    L = L8 // 8
    T = n_entries_per_level
    g = g.astype(jnp.float32)
    grads = []
    for level in range(L):
        sl = slice(level * 8, level * 8 + 8)
        idx_l = flat_idx[:, sl].reshape(-1) - level * T  # (N*8,)
        # corner cotangents v_f = w * g_f, built directly in the packed
        # (B // 64, 128) layout (interleaved feature pairs) — never a
        # (B, 2)-shaped tensor, whose tiled layout pads 64x.
        v0 = (corner_w[:, sl] * g[:, level, 0][:, None]).reshape(-1, PACK)
        v1 = (corner_w[:, sl] * g[:, level, 1][:, None]).reshape(-1, PACK)
        v_packed = jnp.stack([v0, v1], axis=-1).reshape(-1, LANES)
        grads.append(hash_grad_scatter_packed(idx_l, v_packed, T))
    d_table = jnp.concatenate(grads, axis=0).astype(jnp.float32)
    return (
        d_table.reshape(table_shape),
        jnp.zeros(flat_idx.shape, jnp.float32),
        jnp.zeros_like(corner_w),
    )


hash_encode_lookup.defvjp(_lookup_fwd, _lookup_bwd)
