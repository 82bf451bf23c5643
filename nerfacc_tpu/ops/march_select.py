"""Pallas TPU kernel: fused slot selection + lattice evaluation.

The grouped march (``ray_marching.march_rays`` with ``coarse_stride > 1``)
spends its non-gather time in a chain of small dense ops — cumsum over
probe groups, rank-target compares, two one-hot gathers over the group
axis, and four closed-form lattice evaluations (``select_slots_grouped`` +
``_lattice_t`` x3). XLA compiles this region into dozens of small fusions
(the "572 op kinds ~= 2 ms tail" of the step anatomy in
docs/benchmarks.md): each is VPU-trivial but pays its own scheduling and
HBM round trip for (R, K<=64)-shaped intermediates that tile-pad 2x on
the lane axis.

This kernel runs the whole region as one program per ray block, entirely
in VMEM: inputs are the probe results ``live_groups (R, G) int32`` (the
only part of marching that must gather — the bit-table occupancy probes —
stays in XLA, where the (N, 128)-row gather is already at its measured
~1.9 ns/row floor), per-ray ``group_size`` and ``t_min``; outputs are the
final ``t_starts / t_ends / deltas (R, K) f32`` and the slot-validity
mask. No gathers anywhere inside: the rank search and the two row lookups
over the G axis are unrolled compare/select reductions (G is 32-64), and
the one-hot "gather" of the cumulative count is the same trick
``ray_marching.gather_rows_dense`` uses, fused with everything else.

Replaces the selection half of the reference's marching kernel
(``cuda/csrc/ray_marching.cu:81-192`` pass 2: emitting t_starts/t_ends
per live sample); the counting half (pass 1) is the XLA probe phase.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic does NOT reuse stack buffers across the kernels' unrolled
# group/slot loops: every iteration's (blk, K) temporaries (lane-padded
# to 128) are allocated side by side, so the scoped-VMEM stack scales
# with loop_iters x blk. Measured on v5e against the 16M limit:
#   select   G=32  BLK=1024 -> 17.04M;  G=128 BLK=512 -> 33.37M
#   reselect K=48  BLK=512  -> 56.14M
# i.e. select ~ G*BLK*512 bytes, reselect ~ K*BLK*2304 bytes. Pick the
# largest power-of-two block that keeps the model under a 12M budget.
_VMEM_STACK_BUDGET = 12 * 1024 * 1024


def _blk_for(per_row_bytes: int, r: int, cap: int = 1024) -> int:
    blk = min(cap, max(8, _VMEM_STACK_BUDGET // max(per_row_bytes, 1)))
    blk = 1 << (blk.bit_length() - 1)  # floor to a power of two
    return min(blk, max(8, r))


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _lattice_t_block(t_min, k, step_size, cone_angle, dt_max):
    """Closed-form lattice t(k) on (BLK, K) blocks — mirrors
    ``ray_marching._lattice_t`` (see there for the derivation)."""
    if cone_angle <= 0.0:
        return t_min + k * step_size
    c = cone_angle
    dmin, dmax = step_size, dt_max
    nA = jnp.ceil(jnp.maximum(dmin / c - t_min, 0.0) / dmin)
    tA = t_min + nA * dmin
    log_grow = math.log1p(c)
    ratio = dmax / (c * jnp.maximum(tA, 1e-10))
    nB = jnp.ceil(
        jnp.maximum(jnp.log(jnp.maximum(ratio, 1.0)), 0.0) / log_grow
    )
    kA = jnp.minimum(k, nA)
    kB = jnp.clip(k - nA, 0.0, nB)
    kC = jnp.maximum(k - nA - nB, 0.0)
    return (t_min + kA * dmin) * jnp.exp(log_grow * kB) + kC * dmax


def _select_kernel(
    live_ref, gsize_ref, tmin_ref,
    ts_ref, te_ref, dt_ref, ok_ref,
    *, k_slots, step_size, cone_angle, dt_max,
):
    live = live_ref[:]  # (BLK, G) int32
    G = live.shape[1]
    s = gsize_ref[:]  # (BLK, 1) int32
    t_min = tmin_ref[:]  # (BLK, 1) f32

    # inclusive cumsum over the (small, static) group axis: log2(G)
    # rounds of statically-shifted adds — no reduce-window, lane shifts
    # are static pads/slices on VMEM values
    c = live
    shift = 1
    while shift < G:
        c = c + jnp.pad(c, ((0, 0), (shift, 0)))[:, :G]
        shift *= 2
    count = c[:, G - 1 : G]  # (BLK, 1)

    j = jax.lax.broadcasted_iota(jnp.int32, (1, k_slots), 1)
    stride = jnp.maximum((count + k_slots - 1) // k_slots, 1)  # (BLK, 1)
    tgt = j * stride + 1  # (BLK, K) sample-rank targets
    ok = tgt <= count
    scale = jnp.clip(count - j * stride, 0, stride)

    # rank search + cum-before one-hot, unrolled over G: per group one
    # (BLK, 1) vs (BLK, K) compare — all 2D VPU ops, no 3D temporaries
    gidx = jnp.zeros(tgt.shape, jnp.int32)
    for g in range(G):
        gidx = gidx + (c[:, g : g + 1] < tgt).astype(jnp.int32)
    gidx = jnp.minimum(gidx, G - 1)
    cum_before = jnp.zeros(tgt.shape, jnp.int32)
    for g in range(1, G):
        cum_before = jnp.where(gidx == g, c[:, g - 1 : g], cum_before)
    offset = tgt - 1 - cum_before
    pos = gidx * s + jnp.clip(offset, 0, s - 1)

    posf = pos.astype(jnp.float32)
    lat = functools.partial(
        _lattice_t_block,
        t_min,
        step_size=step_size,
        cone_angle=cone_angle,
        dt_max=dt_max,
    )
    ts = lat(posf)
    ts_ref[:] = ts
    te_ref[:] = lat(posf + 1.0)
    # exact decimation-group width (see march_rays: (te-ts)*scale would
    # under-cover geometric s-groups when cone_angle > 0)
    dt_ref[:] = lat((pos + scale).astype(jnp.float32)) - ts
    ok_ref[:] = ok.astype(jnp.int32)


def fused_select_grouped(
    live_groups: jnp.ndarray,
    group_size: jnp.ndarray,
    t_min: jnp.ndarray,
    *,
    k_slots: int,
    step_size: float,
    cone_angle: float = 0.0,
    dt_max: float = 1e10,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused ``select_slots_grouped`` + lattice evaluation.

    Args:
        live_groups: (R, G) int32 live-candidate counts per probe group.
        group_size: (R, 1) int32 per-ray probe stride.
        t_min: (R,) f32 marching origins.
        k_slots: slots per ray (static).
        step_size / cone_angle / dt_max: lattice parameters (static).

    Returns:
        (t_starts, t_ends, deltas, ok): three (R, K) f32 and one (R, K)
        bool, bit-identical to the unfused
        ``select_slots_grouped`` + ``_lattice_t`` path.
    """
    R, G = live_groups.shape
    if interpret is None:
        interpret = _use_interpret()
    blk = _blk_for(G * 512, R)
    pad = (-R) % blk
    if pad:
        live_groups = jnp.pad(live_groups, ((0, pad), (0, 0)))
        group_size = jnp.pad(
            group_size, ((0, pad), (0, 0)), constant_values=1
        )
        t_min = jnp.pad(t_min, ((0, pad),))
    n = live_groups.shape[0]

    kernel = functools.partial(
        _select_kernel,
        k_slots=k_slots,
        step_size=float(step_size),
        cone_angle=float(cone_angle),
        dt_max=float(dt_max),
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, k_slots), jnp.float32),
        jax.ShapeDtypeStruct((n, k_slots), jnp.float32),
        jax.ShapeDtypeStruct((n, k_slots), jnp.float32),
        jax.ShapeDtypeStruct((n, k_slots), jnp.int32),
    ]
    row_spec = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0))
    ts, te, dt, ok = pl.pallas_call(
        kernel,
        grid=(n // blk,),
        in_specs=[row_spec(G), row_spec(1), row_spec(1)],
        out_specs=[row_spec(k_slots)] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(live_groups, group_size, t_min[:, None].astype(jnp.float32))
    if pad:
        ts, te, dt, ok = ts[:R], te[:R], dt[:R], ok[:R]
    return ts, te, dt, ok > 0


def _reselect_kernel(
    m_ref, ts_ref, te_ref, dt_ref,
    ts2_ref, te2_ref, dt2_ref, ok2_ref,
    *, k2,
):
    m = m_ref[:]  # (BLK, K) int32 0/1
    K = m.shape[1]
    ts, te, dt = ts_ref[:], te_ref[:], dt_ref[:]

    # inclusive cumsums (int ranks + f32 live widths) via log-shift adds
    c = m
    d_live = jnp.where(m > 0, dt, 0.0)
    cd = d_live
    shift = 1
    while shift < K:
        c = c + jnp.pad(c, ((0, 0), (shift, 0)))[:, :K]
        cd = cd + jnp.pad(cd, ((0, 0), (shift, 0)))[:, :K]
        shift *= 2
    count = c[:, K - 1 : K]
    total_w = cd[:, K - 1 : K]

    j = jax.lax.broadcasted_iota(jnp.int32, (1, k2), 1)
    stride = jnp.maximum((count + k2 - 1) // k2, 1)
    tgt = j * stride + 1
    ok2 = tgt <= count

    # rank search + the four row lookups at pos2, unrolled over the slot
    # axis: per source slot one (BLK, 1) vs (BLK, k2) compare/select
    pos2 = jnp.zeros(tgt.shape, jnp.int32)
    for k in range(K):
        pos2 = pos2 + (c[:, k : k + 1] < tgt).astype(jnp.int32)
    pos2 = jnp.minimum(pos2, K - 1)
    g_ts = jnp.zeros(tgt.shape, jnp.float32)
    g_te = jnp.zeros(tgt.shape, jnp.float32)
    g_cd = jnp.zeros(tgt.shape, jnp.float32)
    g_dl = jnp.zeros(tgt.shape, jnp.float32)
    for k in range(K):
        sel = pos2 == k
        g_ts = jnp.where(sel, ts[:, k : k + 1], g_ts)
        g_te = jnp.where(sel, te[:, k : k + 1], g_te)
        g_cd = jnp.where(sel, cd[:, k : k + 1], g_cd)
        g_dl = jnp.where(sel, d_live[:, k : k + 1], g_dl)

    # exact decimation-group widths: groups tile the live slots in rank
    # order, so group j's width is the masked-delta cumsum span from its
    # own start to the next group's start (total for the last live group)
    start_excl = g_cd - g_dl
    # pad as int32: Mosaic has no i1 vreg pad (bitcast_vreg i1->i32 fails
    # "Invalid vector register cast" on v5e — measured on-chip)
    ok_next = jnp.pad(ok2.astype(jnp.int32), ((0, 0), (0, 1)))[:, 1:] > 0
    next_start = jnp.pad(start_excl, ((0, 0), (0, 1)))[:, 1:]
    widths = jnp.where(ok_next, next_start, total_w) - start_excl
    ts2_ref[:] = g_ts
    te2_ref[:] = g_te
    dt2_ref[:] = jnp.where(ok2, widths, 0.0)
    ok2_ref[:] = ok2.astype(jnp.int32)


def fused_reselect(
    masks: jnp.ndarray,
    t_starts: jnp.ndarray,
    t_ends: jnp.ndarray,
    deltas: jnp.ndarray,
    *,
    k2: int,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused visible-sample re-selection (stage 2 of the two-stage render).

    Re-selects each ray's ``k2`` live slots out of (R, K) masked samples
    with exact decimation-group widths — one kernel instead of the
    select_slots + 4x gather_rows_dense + width-algebra chain. Matches
    ``ray_marching.reselect_visible``'s XLA path.

    Returns (t_starts2, t_ends2, deltas2, ok2): (R, k2) f32 x3 + bool.
    """
    R, K = masks.shape
    if interpret is None:
        interpret = _use_interpret()
    blk = _blk_for(K * 2304, R)
    pad = (-R) % blk
    if pad:
        masks = jnp.pad(masks, ((0, pad), (0, 0)))
        t_starts = jnp.pad(t_starts, ((0, pad), (0, 0)))
        t_ends = jnp.pad(t_ends, ((0, pad), (0, 0)))
        deltas = jnp.pad(deltas, ((0, pad), (0, 0)))
    n = masks.shape[0]
    out_shape = [
        jax.ShapeDtypeStruct((n, k2), jnp.float32),
        jax.ShapeDtypeStruct((n, k2), jnp.float32),
        jax.ShapeDtypeStruct((n, k2), jnp.float32),
        jax.ShapeDtypeStruct((n, k2), jnp.int32),
    ]
    row_spec = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0))
    ts2, te2, dt2, ok2 = pl.pallas_call(
        functools.partial(_reselect_kernel, k2=k2),
        grid=(n // blk,),
        in_specs=[row_spec(K)] * 4,
        out_specs=[row_spec(k2)] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(masks.astype(jnp.int32), t_starts, t_ends, deltas)
    if pad:
        ts2, te2, dt2, ok2 = ts2[:R], te2[:R], dt2[:R], ok2[:R]
    return ts2, te2, dt2, ok2 > 0
