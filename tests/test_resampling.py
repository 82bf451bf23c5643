"""CDF resampling shapes + importance-concentration sanity
(reference tests/test_resampling.py:25-28, strengthened)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu import pack_info, ray_marching, ray_resampling


def test_resampling_shapes():
    rng = np.random.RandomState(0)
    rays_o = jnp.array(rng.rand(32, 3), jnp.float32)
    rays_d = jnp.array(rng.randn(32, 3), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    ray_indices, t_starts, t_ends, masks = ray_marching(
        rays_o, rays_d, near_plane=0.1, far_plane=1.0,
        render_step_size=1e-2, max_samples_per_ray=128,
    )
    packed_info = pack_info(ray_indices, n_rays=32, masks=masks)
    weights = jnp.array(rng.rand(t_starts.shape[0]), jnp.float32)
    out = ray_resampling(
        None, t_starts, t_ends, weights, n_samples=32,
        ray_indices=ray_indices, n_rays=32, masks=masks,
    )
    assert out.t_starts.shape == (32 * 32, 1)
    assert out.t_ends.shape == (32 * 32, 1)
    assert out.packed_info.shape == (32, 2)
    m = np.asarray(out.masks)
    ts = np.asarray(out.t_starts)[:, 0][m]
    te = np.asarray(out.t_ends)[:, 0][m]
    assert (te >= ts - 1e-6).all()


def test_resampling_concentrates_on_peak():
    """One ray, weights peaked in [0.45, 0.55] -> most resamples land there."""
    n = 64
    t = jnp.linspace(0.0, 1.0, n + 1)
    t_starts = t[:-1][:, None]
    t_ends = t[1:][:, None]
    mid = (t[:-1] + t[1:]) / 2
    weights = jnp.where((mid > 0.45) & (mid < 0.55), 1.0, 0.01)
    ray_indices = jnp.zeros(n, jnp.int32)
    out = ray_resampling(
        None, t_starts, t_ends, weights, n_samples=32,
        ray_indices=ray_indices, n_rays=1,
    )
    mids = (np.asarray(out.t_starts) + np.asarray(out.t_ends))[:, 0] / 2
    frac_in_peak = ((mids > 0.43) & (mids < 0.57)).mean()
    assert frac_in_peak > 0.5
    # boundaries monotone
    assert (np.diff(mids) > -1e-6).all()


def test_resampling_empty_ray_masked():
    t_starts = jnp.array([[0.1], [0.2]], jnp.float32)
    t_ends = jnp.array([[0.2], [0.3]], jnp.float32)
    weights = jnp.array([0.5, 0.5], jnp.float32)
    ray_indices = jnp.array([0, 0], jnp.int32)  # ray 1 empty
    out = ray_resampling(
        None, t_starts, t_ends, weights, n_samples=8,
        ray_indices=ray_indices, n_rays=2,
    )
    m = np.asarray(out.masks).reshape(2, 8)
    assert m[0].all() and not m[1].any()
    assert int(out.packed_info[1, 1]) == 0


@pytest.mark.slow
def test_resampling_segment_clamp_large_n_rays():
    """At large n_rays the f32 ulp of the global-CDF ray offset exceeds
    the bin spacing, so an unclamped searchsorted can resolve a seam query
    into a *neighboring ray's* segment (advisor round-1 finding). Rays
    carry parity-coded t ranges; every resample must stay in its own."""
    n_rays = (1 << 21) + 8  # ulp(2^21) = 0.25 > bin spacing
    r = jnp.arange(n_rays, dtype=jnp.int32)
    parity = (r % 2).astype(jnp.float32)
    # even rays: t in [0, 1]; odd rays: t in [5, 6]
    ts = (parity * 5.0)[:, None]
    te = ts + 1.0
    weights = jnp.ones((n_rays,), jnp.float32)
    out = ray_resampling(
        None, ts, te, weights, n_samples=2,
        ray_indices=r, n_rays=n_rays,
    )
    got_ts = np.asarray(out.t_starts).reshape(n_rays, 2)
    got_te = np.asarray(out.t_ends).reshape(n_rays, 2)
    lo = np.asarray(ts)[:, 0:1]
    hi = lo + 1.0
    assert (got_ts >= lo - 1e-3).all() and (got_te <= hi + 1e-3).all()
