"""Occupancy grid (TPU-native, functional).

Redesign of the reference ``nerfacc/grid.py`` for JAX: the grid is an
immutable pytree (``flax.struct.dataclass``) and the EMA update is a pure
function ``(grid, key, ...) -> grid`` that the training loop jits. The
torch version mutates ``nn.Module`` buffers in place; here every piece of
state is explicit, which is also what makes multi-chip replication and
checkpointing trivial (the grid is just arrays).

Semantics preserved from the reference:
  * EMA update ``occs[idx] = max(occs[idx] * decay, occ)`` with cell
    selection "all cells during warmup, else N uniform + N occupied"
    (``grid.py:196-239``);
  * binarization at ``occs > min(mean(occs), occ_thre)`` (``grid.py:237-239``);
  * query semantics of ``grid_occupied_at`` (``ray_marching.cu:27-45``):
    AABB grids return unoccupied outside the roi; all types contract the
    point and do a nearest-cell lookup.

Static-shape note: "occupied cells" selection uses inverse-CDF sampling
with replacement over the binary mask (the reference gathers the exact
occupied set, a dynamic shape); with N = num_cells / 4 draws this is
statistically equivalent for the EMA.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .contraction import ContractionType, contract, contract_inv
from .lookup import bit_lookup, pack_bits


def dilate_binary(binary: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 box (max) dilation, separable per axis.

    Used for the strided coarse occupancy test in the marcher: a sample
    within half a voxel of a stride point is covered by the dilated value
    at that point, so striding cannot produce false negatives.
    """
    x = binary
    for axis in range(3):
        lo = jnp.roll(x, 1, axis=axis).at[(slice(None),) * axis + (0,)].set(False)
        hi = jnp.roll(x, -1, axis=axis).at[(slice(None),) * axis + (-1,)].set(False)
        x = x | lo | hi
    return x


def query_grid(
    samples: jnp.ndarray,
    grid_roi: jnp.ndarray,
    grid_values: jnp.ndarray,
    grid_type: ContractionType,
) -> jnp.ndarray:
    """Query a 3D grid at world-space points (reference ``grid.py:18-47``
    + ``ray_marching.cu:27-45``).

    Args:
        samples: (n_samples, 3) world coordinates.
        grid_roi: (6,) grid region of interest.
        grid_values: (resx, resy, resz) grid (bool or float).
        grid_type: contraction of the grid.

    Returns:
        (n_samples,) values; 0/False outside the roi for AABB grids.
    """
    res = jnp.asarray(grid_values.shape, dtype=jnp.int32)
    unit = contract(samples, grid_roi, grid_type)
    ixyz = jnp.clip(
        jnp.floor(unit * res).astype(jnp.int32), 0, res - 1
    )
    flat = (
        ixyz[..., 0] * (res[1] * res[2]) + ixyz[..., 1] * res[2] + ixyz[..., 2]
    )
    vals = grid_values.reshape(-1)[flat]
    if grid_type == ContractionType.AABB:
        inside = jnp.all(
            (samples >= grid_roi[:3]) & (samples <= grid_roi[3:]), axis=-1
        )
        zero = jnp.zeros((), dtype=grid_values.dtype)
        vals = jnp.where(inside, vals, zero)
    return vals


@flax.struct.dataclass
class OccupancyGrid:
    """Occupancy grid state (a pytree of arrays + static metadata).

    Attributes:
        roi_aabb: (6,) region of interest.
        occs: (num_cells,) float EMA of per-cell occupancy.
        binary: (resx, resy, resz) bool occupied mask.
        resolution: static (3,) tuple.
        contraction_type: static contraction of the grid.
    """

    roi_aabb: jnp.ndarray
    occs: jnp.ndarray
    binary: jnp.ndarray
    # bit-packed copies of `binary` (and its 1-, 2- and 4-voxel dilations)
    # for the fast row-gather lookup path (see nerfacc_tpu.lookup); kept in
    # sync by create_grid / update_grid / with_binary. A radius-r table
    # lets marchers probe every C-th candidate (C * dt / 2 <= r voxels) at
    # 1/C-th the lookup volume.
    bits: jnp.ndarray
    bits_dilated: jnp.ndarray
    bits_dilated2: jnp.ndarray
    bits_dilated4: jnp.ndarray
    resolution: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    contraction_type: ContractionType = flax.struct.field(pytree_node=False)

    @property
    def num_cells(self) -> int:
        rx, ry, rz = self.resolution
        return rx * ry * rz

    # convenience: world-space centers lookup
    def query_occ(self, samples: jnp.ndarray) -> jnp.ndarray:
        """Binary occupancy at world-space points (reference
        ``grid.py:279-294``)."""
        return query_grid(
            samples, self.roi_aabb, self.binary, self.contraction_type
        )

    def query_occ_fast(
        self, samples: jnp.ndarray, dilated: int = 0
    ) -> jnp.ndarray:
        """Occupancy at world-space points via the bit-table fast path.

        Semantics match :func:`query_grid` on the binary grid; ~10x faster
        on TPU for large batches (row gather vs per-element gather).
        ``dilated`` selects the dilation radius (0 exact, 1, or 2).
        """
        res = jnp.asarray(self.resolution, dtype=jnp.int32)
        unit = contract(samples, self.roi_aabb, self.contraction_type)
        ixyz = jnp.clip(jnp.floor(unit * res).astype(jnp.int32), 0, res - 1)
        flat = (
            ixyz[..., 0] * (res[1] * res[2])
            + ixyz[..., 1] * res[2]
            + ixyz[..., 2]
        )
        table = {
            0: self.bits,
            1: self.bits_dilated,
            2: self.bits_dilated2,
            4: self.bits_dilated4,
        }[int(dilated)]
        vals = bit_lookup(table, flat)
        if self.contraction_type == ContractionType.AABB:
            lo, hi = self.roi_aabb[:3], self.roi_aabb[3:]
            if dilated:
                # Dilated queries are recall-oriented (march probes): a
                # probe within `dilated` voxels OUTSIDE the box must still
                # see the boundary voxel's dilated bit (the index clamp
                # already maps it there), otherwise probe groups straddling
                # the box exit lose their in-box members whenever the
                # t-range is not aabb-bounded. The widened band only adds
                # false positives, which the exact re-check removes.
                margin = dilated * (hi - lo) / res.astype(jnp.float32)
                lo, hi = lo - margin, hi + margin
            inside = jnp.all(
                (samples >= lo) & (samples <= hi), axis=-1
            )
            vals = vals & inside
        return vals


# alias for API parity with the reference's abstract base
Grid = OccupancyGrid


def with_binary(grid: OccupancyGrid, binary: jnp.ndarray) -> OccupancyGrid:
    """Replace the binary mask, keeping the packed bit-tables in sync."""
    binary = binary.astype(bool)
    d1 = dilate_binary(binary)
    d2 = dilate_binary(d1)
    d4 = dilate_binary(dilate_binary(d2))
    return grid.replace(
        binary=binary,
        bits=pack_bits(binary),
        bits_dilated=pack_bits(d1),
        bits_dilated2=pack_bits(d2),
        bits_dilated4=pack_bits(d4),
    )


def create_grid(
    roi_aabb: Union[Sequence[float], jnp.ndarray],
    resolution: Union[int, Sequence[int]] = 128,
    contraction_type: ContractionType = ContractionType.AABB,
    occupied: bool = False,
) -> OccupancyGrid:
    """Create a fresh occupancy grid (reference ``grid.py:127-174``).

    Args:
        occupied: initialize all cells occupied (useful for tests /
            grid-free marching). The reference initializes all-zero.
    """
    if isinstance(resolution, int):
        resolution = (resolution,) * 3
    resolution = tuple(int(r) for r in resolution)
    roi_aabb = jnp.asarray(roi_aabb, dtype=jnp.float32)
    assert roi_aabb.shape == (6,), f"Invalid shape: {roi_aabb.shape}"
    nc = int(np.prod(resolution))
    binary = jnp.full(resolution, occupied, dtype=bool)
    bits = pack_bits(binary)
    return OccupancyGrid(
        roi_aabb=roi_aabb,
        occs=jnp.zeros((nc,), dtype=jnp.float32),
        binary=binary,
        bits=bits,
        bits_dilated=bits,  # dilation of all-const == itself
        bits_dilated2=bits,
        bits_dilated4=bits,
        resolution=resolution,
        contraction_type=contraction_type,
    )


def _grid_coords(resolution: Tuple[int, int, int]) -> jnp.ndarray:
    """(num_cells, 3) integer cell coordinates, x-major like the reference
    (``grid.py:297-313``)."""
    rx, ry, rz = resolution
    gx, gy, gz = jnp.meshgrid(
        jnp.arange(rx), jnp.arange(ry), jnp.arange(rz), indexing="ij"
    )
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def _sample_cells(
    grid: OccupancyGrid, key: jax.Array, n: int
) -> jnp.ndarray:
    """n uniform + n occupied cell indices (with replacement), the
    post-warmup selection of reference ``grid.py:181-194``."""
    k_uni, k_occ = jax.random.split(key)
    uniform_idx = jax.random.randint(k_uni, (n,), 0, grid.num_cells)
    w = grid.binary.reshape(-1).astype(jnp.float32)
    cdf = jnp.cumsum(w)
    total = cdf[-1]
    u = jax.random.uniform(k_occ, (n,)) * jnp.maximum(total, 1.0)
    occ_idx = jnp.searchsorted(cdf, u, side="right")
    occ_idx = jnp.clip(occ_idx, 0, grid.num_cells - 1)
    # no occupied cells yet -> fall back to uniform
    occ_idx = jnp.where(total > 0, occ_idx, uniform_idx)
    return jnp.concatenate([uniform_idx, occ_idx])


def _chunked_eval(fn, x: jnp.ndarray, chunk: int = 1 << 17) -> jnp.ndarray:
    """Evaluate ``fn`` over (N, 3) points in fixed-size chunks via
    ``lax.map``. Bounds peak memory for whole-grid warmup updates (a 256^3
    grid is 16.7M points — evaluating a field with (B, G)-shaped
    intermediates on all of them at once OOMs a 16 GB chip)."""
    n = x.shape[0]
    if n <= chunk:
        return fn(x)
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)])
    out = jax.lax.map(fn, x.reshape(-1, chunk, 3))
    return out.reshape((-1,) + out.shape[2:])[:n]


def update_grid(
    grid: OccupancyGrid,
    key: jax.Array,
    step: int,
    occ_eval_fn: Callable[[jnp.ndarray], jnp.ndarray],
    occ_thre: float = 1e-2,
    ema_decay: float = 0.95,
    warmup_steps: int = 256,
    adaptive_thre: bool = True,
) -> OccupancyGrid:
    """One EMA occupancy update (pure; reference ``grid.py:196-239``).

    Args:
        key: PRNG key (replaces the reference's global torch RNG).
        step: current training step — must be a *Python int* (it selects
            between the warmup all-cells path and the sampled path, which
            have different shapes; each path jits once).
        occ_eval_fn: world-space (N, 3) -> (N, 1) occupancy (density * step).
        adaptive_thre: binarize at ``min(mean(occs), occ_thre)`` like the
            reference (``grid.py:237-239``). The adaptive ``min`` exists to
            bootstrap sparse scenes, but when a scene trains through a
            uniform-fog phase it keeps *every* fog cell occupied (mean
            drops below the fog level) and the fog becomes
            self-reinforcing — measured on the unbounded procedural
            config. ``False`` binarizes at the fixed ``occ_thre`` after
            warmup (warmup always uses the adaptive rule so an untrained
            field is not pruned to nothing).
    """
    k_sel, k_jit = jax.random.split(key)
    if step < warmup_steps:
        indices = jnp.arange(grid.num_cells)
    else:
        indices = _sample_cells(grid, k_sel, grid.num_cells // 4)

    coords = _grid_coords(grid.resolution)[indices]
    res = jnp.asarray(grid.resolution, dtype=jnp.float32)
    x_unit = (coords + jax.random.uniform(k_jit, coords.shape)) / res

    if grid.contraction_type == ContractionType.UN_BOUNDED_SPHERE:
        # only points inside the unit sphere are valid (grid.py:218-222)
        valid = jnp.linalg.norm(x_unit - 0.5, axis=-1) < 0.5
    else:
        valid = jnp.ones(indices.shape, dtype=bool)

    x = contract_inv(x_unit, grid.roi_aabb, grid.contraction_type)
    occ = _chunked_eval(occ_eval_fn, x).reshape(-1)
    occ = jnp.where(valid, occ, -1.0)  # invalid: no-op under scatter-max

    # decay selected (valid) cells once, then scatter-max the new estimates
    sel = jnp.zeros((grid.num_cells,), dtype=bool).at[indices].max(valid)
    occs = jnp.where(sel, grid.occs * ema_decay, grid.occs)
    occs = occs.at[indices].max(occ)

    if adaptive_thre or step < warmup_steps:
        thre = jnp.minimum(jnp.mean(occs), occ_thre)
    else:
        thre = jnp.asarray(occ_thre)
    binary = (occs > thre).reshape(grid.binary.shape)
    return with_binary(grid.replace(occs=occs), binary)


def every_n_step(
    grid: OccupancyGrid,
    key: jax.Array,
    step: int,
    occ_eval_fn: Callable,
    occ_thre: float = 1e-2,
    ema_decay: float = 0.95,
    warmup_steps: int = 256,
    n: int = 16,
    adaptive_thre: bool = True,
) -> OccupancyGrid:
    """Update the grid every ``n`` steps (reference ``grid.py:241-277``);
    returns the (possibly unchanged) grid. ``step`` must be a Python int."""
    if step % n == 0:
        return update_grid(
            grid, key, step, occ_eval_fn,
            occ_thre=occ_thre, ema_decay=ema_decay, warmup_steps=warmup_steps,
            adaptive_thre=adaptive_thre,
        )
    return grid
