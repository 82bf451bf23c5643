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

        # (N, L, 3): per-level continuous grid coords
        xl = x[:, None, :] * res[None, :, None].astype(x.dtype)
        c0 = jnp.floor(xl)
        w = xl - c0  # trilinear weights in [0, 1)
        c0 = c0.astype(jnp.int32)

        # 8 corners: (N, L, 8, 3)
        offsets = jnp.asarray(
            [
                [i, j, k]
                for i in (0, 1)
                for j in (0, 1)
                for k in (0, 1)
            ],
            jnp.int32,
        )
        corners = c0[:, :, None, :] + offsets[None, None, :, :]
        corners = jnp.clip(corners, 0, res[None, :, None, None])

        # hashed index (xor of primes) vs dense index, per level
        cu = corners.astype(jnp.uint32)
        hashed = (
            cu[..., 0] * jnp.uint32(_PRIMES[0])
            ^ cu[..., 1] * jnp.uint32(_PRIMES[1])
            ^ cu[..., 2] * jnp.uint32(_PRIMES[2])
        ) & jnp.uint32(T - 1)
        stride = (res + 1).astype(jnp.uint32)
        dense_idx = (
            cu[..., 0] * (stride * stride)[None, :, None]
            + cu[..., 1] * stride[None, :, None]
            + cu[..., 2]
        )
        idx = jnp.where(self._dense[None, :, None], dense_idx, hashed)
        level_offset = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))[
            None, :, None
        ]
        flat_idx = (idx + level_offset).astype(jnp.int32)  # (N, L, 8)

        # trilinear blend: weight per corner = prod over dims of (w or 1-w)
        wx = jnp.where(offsets[None, None, :, 0] == 1, w[..., None, 0], 1 - w[..., None, 0])
        wy = jnp.where(offsets[None, None, :, 1] == 1, w[..., None, 1], 1 - w[..., None, 1])
        wz = jnp.where(offsets[None, None, :, 2] == 1, w[..., None, 2], 1 - w[..., None, 2])
        cw = (wx * wy * wz).astype(jnp.float32)  # (N, L, 8)

        if self.pallas_grad and F == 2:
            from ..ops.hash_gather import hash_encode_lookup

            out = hash_encode_lookup(
                self.table.astype(jnp.float32), flat_idx, cw, T
            )
        else:
            vals = self.table[flat_idx.reshape(-1)].reshape(N, L, 8, F)
            vals = vals.astype(jnp.float32)
            out = (vals * cw[..., None]).sum(axis=2)  # (N, L, F)
        return out.reshape(N, L * F)
