"""Multiresolution hash encoding (Instant-NGP) in pure JAX.

TPU-native replacement for the tcnn ``HashGrid`` encoder the reference's
NGP example depends on (``examples/radiance_fields/ngp.py:108-126``). The
tcnn kernel is a fused CUDA gather; on TPU the same computation is a
batched multi-level gather + trilinear blend, which XLA lowers to dynamic
gathers from an HBM-resident table. Design choices for TPU:

  * one flat (L * T, F) table: per-level offsets are added to hashed
    indices, so the whole encode is a single gather of (N, L, 8, F);
  * levels whose dense grid fits the table are indexed densely, exactly
    like tcnn (hashing only when (res+1)^3 > T);
  * the spatial hash is the standard xor-of-primes
    (pi_1, pi_2, pi_3) = (1, 2654435761, 805459861) masked to T-1.

The *backward* is where XLA's lowering hurts most: grad-of-gather becomes
an HBM scatter-add (serialized, ~10-170 ns/element on v5e), which
dominates hash-NGP training steps. With ``pallas_grad=True`` (default,
``n_features == 2`` only) the lookup+blend runs through
:func:`nerfacc_tpu.ops.hash_gather.hash_encode_lookup`, whose custom
backward accumulates each level's table gradient in a VMEM-resident
Pallas kernel instead (see ``ops/hash_gather.py``); measured comparison
in ``docs/benchmarks.md``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


def _level_resolutions(
    n_levels: int, base_resolution: int, per_level_scale: float
) -> np.ndarray:
    # N_l = floor(N_min * b^l)  (Instant-NGP Eq. 2)
    return np.floor(
        base_resolution * per_level_scale ** np.arange(n_levels)
    ).astype(np.int64)


class HashEncoder(nn.Module):
    """Instant-NGP multiresolution hash encoding.

    Input (N, 3) in [0, 1]^3 -> output (N, n_levels * n_features).
    """

    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.4472692012786865
    param_dtype: jnp.dtype = jnp.float32
    pallas_grad: bool = True

    def setup(self):
        T = 1 << self.log2_hashmap_size
        res = _level_resolutions(
            self.n_levels, self.base_resolution, self.per_level_scale
        )
        self._res = jnp.asarray(res, jnp.int32)
        # dense indexing where the full grid fits (tcnn behavior)
        dense = (res + 1) ** 3 <= T
        self._dense = jnp.asarray(dense)
        self._T = T
        self.table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1e-4, maxval=1e-4, dtype=self.param_dtype
            ),
            (self.n_levels * T, self.n_features),
        )

    @property
    def latent_dim(self) -> int:
        return self.n_levels * self.n_features

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N = x.shape[0]
        L, T, F = self.n_levels, self._T, self.n_features
        res = self._res  # (L,)

        # All per-corner intermediates live on a lane-packed (N, L*8)
        # layout with one array per spatial component. A (N, L, 8, 3)
        # formulation is 4x the FLOPs' worth of HBM: XLA tiles the two
        # minor dims (8, 3) up to (8, 128), so at bench scale
        # (N = 786k, L = 16) the corner tensor alone was a 19 GB
        # allocation — an HBM OOM on v5e (measured round 2). With L = 16
        # the packed minor dim is exactly one 128-lane row.
        ox = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)
        oy = jnp.asarray([0, 0, 1, 1, 0, 0, 1, 1], jnp.int32)
        oz = jnp.asarray([0, 1, 0, 1, 0, 1, 0, 1], jnp.int32)

        # (N, L): per-level continuous grid coords, one array per axis
        def _axis(xc):
            xl = xc[:, None] * res[None, :].astype(x.dtype)
            c0 = jnp.floor(xl)
            return c0.astype(jnp.int32), xl - c0  # (N, L) int, (N, L) frac

        c0x, wx_f = _axis(x[:, 0])
        c0y, wy_f = _axis(x[:, 1])
        c0z, wz_f = _axis(x[:, 2])

        res_row = jnp.broadcast_to(res[:, None], (L, 8)).reshape(L * 8)

        def _corners(c0c, oc):
            c = c0c[:, :, None] + oc[None, None, :]  # (N, L, 8)
            c = c.reshape(N, L * 8)
            return jnp.clip(c, 0, res_row[None, :]).astype(jnp.uint32)

        cx, cy, cz = _corners(c0x, ox), _corners(c0y, oy), _corners(c0z, oz)

        # hashed index (xor of primes) vs dense index, per level
        hashed = (
            cx * jnp.uint32(_PRIMES[0])
            ^ cy * jnp.uint32(_PRIMES[1])
            ^ cz * jnp.uint32(_PRIMES[2])
        ) & jnp.uint32(T - 1)
        stride = (res + 1).astype(jnp.uint32)
        stride_row = jnp.broadcast_to(stride[:, None], (L, 8)).reshape(L * 8)
        dense_idx = cx * (stride_row * stride_row)[None, :] + cy * stride_row[None, :] + cz
        dense_row = jnp.broadcast_to(self._dense[:, None], (L, 8)).reshape(L * 8)
        idx = jnp.where(dense_row[None, :], dense_idx, hashed)
        level_offset = jnp.broadcast_to(
            (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))[:, None], (L, 8)
        ).reshape(L * 8)
        flat_idx = (idx + level_offset[None, :]).astype(jnp.int32)  # (N, L*8)

        # trilinear blend: weight per corner = prod over dims of (w or 1-w)
        def _cw(wf, oc):
            w8 = jnp.where(
                (oc == 1)[None, None, :], wf[:, :, None], 1 - wf[:, :, None]
            )
            return w8.reshape(N, L * 8)

        cw = (_cw(wx_f, ox) * _cw(wy_f, oy) * _cw(wz_f, oz)).astype(
            jnp.float32
        )

        if self.pallas_grad and F == 2:
            from ..ops.hash_gather import hash_encode_lookup

            out = hash_encode_lookup(
                self.table.astype(jnp.float32), flat_idx, cw, T
            )
        else:
            # per-feature 1-D gathers: (N, L*8) intermediates only — a
            # (N, L, 8, F) row-gather output pads its minor dims to the
            # (8, 128) tile (multi-GB at bench scale, measured OOM)
            tf = self.table.astype(jnp.float32)
            out = jnp.stack(
                [
                    (tf[:, f][flat_idx] * cw).reshape(N, L, 8).sum(-1)
                    for f in range(F)
                ],
                axis=-1,
            )  # (N, L, F)
        return out.reshape(N, L * F)
