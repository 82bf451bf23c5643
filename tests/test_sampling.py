"""Proposal sampling, dense CDF resampling, dense distortion loss."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import (
    loss_distortion,
    loss_distortion_dense,
    proposal_sampling_with_filter,
    ray_resampling,
    ray_resampling_dense,
    sample_along_rays,
)


def _rand_rays(n=16, seed=0):
    rng = np.random.RandomState(seed)
    rays_o = jnp.array(rng.rand(n, 3), jnp.float32)
    rays_d = jnp.array(rng.randn(n, 3), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d


def test_sample_along_rays_uniform():
    rays_o, rays_d = _rand_rays()
    segs = sample_along_rays(rays_o, rays_d, 0.1, 1.1, step_size=0.01)
    assert segs.t_starts.shape == (16, 100)
    assert bool(segs.masks.all())
    np.testing.assert_allclose(np.asarray(segs.t_starts[:, 0]), 0.1, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(segs.t_ends - segs.t_starts), 0.01, atol=1e-6
    )


def test_ray_resampling_dense_concentrates():
    """Resampled intervals cluster where the weights are."""
    R, K = 4, 32
    t0 = jnp.broadcast_to(jnp.arange(K, dtype=jnp.float32)[None], (R, K))
    t1 = t0 + 1.0
    w = jnp.zeros((R, K)).at[:, 10:14].set(1.0)  # mass in t in [10, 14)
    ts, te, m = ray_resampling_dense(t0, t1, w, n_samples=16)
    assert ts.shape == (R, 16) and bool(m.all())
    assert (np.asarray(ts) >= 9.0).all() and (np.asarray(te) <= 15.0).all()
    assert (np.asarray(te) > np.asarray(ts)).all()


def test_ray_resampling_dense_matches_flat():
    rng = np.random.RandomState(1)
    R, K, n = 5, 24, 8
    t0 = jnp.asarray(np.sort(rng.rand(R, K), axis=1), jnp.float32)
    t1 = t0 + 0.05
    w = jnp.asarray(rng.rand(R, K), jnp.float32)
    masks = jnp.asarray(rng.rand(R, K) < 0.8)

    ts_d, te_d, m_d = ray_resampling_dense(t0, t1, w, n, masks=masks)

    ray_ids = jnp.repeat(jnp.arange(R, dtype=jnp.int32), K)
    out = ray_resampling(
        None, t0.reshape(-1, 1), t1.reshape(-1, 1), w.reshape(-1),
        n, ray_indices=ray_ids, n_rays=R, masks=masks.reshape(-1),
    )
    np.testing.assert_allclose(
        np.asarray(ts_d).reshape(-1), np.asarray(out.t_starts)[:, 0],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(te_d).reshape(-1), np.asarray(out.t_ends)[:, 0],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(m_d).reshape(-1), np.asarray(out.masks)
    )


def test_proposal_sampling_pipeline():
    """Two proposal rounds concentrate samples near an opaque slab at
    t in [0.5, 0.6]; filtered + resampled output stays in bounds."""
    rays_o, rays_d = _rand_rays(n=8, seed=2)
    segs = sample_along_rays(rays_o, rays_d, 0.0, 1.0, step_size=1.0 / 64)

    def slab_sigma(t_starts, t_ends):
        tm = (t_starts + t_ends) / 2
        return jnp.where((tm > 0.5) & (tm < 0.6), 50.0, 0.01)

    out, props = proposal_sampling_with_filter(
        segs,
        sigma_fn=slab_sigma,
        proposal_sigma_fns=[slab_sigma, slab_sigma],
        proposal_n_samples=[32, 16],
        proposal_require_grads=True,
        early_stop_eps=1e-4,
        alpha_thre=1e-3,
    )
    assert out.t_starts.shape == (8, 16)
    assert len(props) == 2
    m = np.asarray(out.masks)
    assert m.any()
    tm = (np.asarray(out.t_starts) + np.asarray(out.t_ends)) / 2
    # surviving samples concentrate around the slab
    assert (tm[m] > 0.35).all() and (tm[m] < 0.75).all()
    frac_in_slab = ((tm[m] > 0.48) & (tm[m] < 0.62)).mean()
    assert frac_in_slab > 0.8, frac_in_slab


def test_distortion_dense_matches_flat():
    rng = np.random.RandomState(3)
    R, K = 6, 20
    t0 = jnp.asarray(np.sort(rng.rand(R, K), axis=1), jnp.float32)
    t1 = t0 + 0.02
    w = jnp.asarray(rng.rand(R, K) * 0.1, jnp.float32)
    masks = jnp.asarray(rng.rand(R, K) < 0.7)
    got = loss_distortion_dense(w, t0, t1, masks=masks)
    ray_ids = jnp.repeat(jnp.arange(R, dtype=jnp.int32), K)
    want = loss_distortion(
        None, w.reshape(-1), t0.reshape(-1, 1), t1.reshape(-1, 1),
        ray_indices=ray_ids, n_rays=R, masks=masks.reshape(-1),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-7)


def test_distortion_dense_zero_for_delta():
    """A single point mass has (near) zero distortion; two separated
    masses have more."""
    R, K = 1, 10
    t0 = jnp.arange(K, dtype=jnp.float32)[None]
    t1 = t0 + 0.01
    w_point = jnp.zeros((R, K)).at[0, 5].set(1.0)
    w_spread = jnp.zeros((R, K)).at[0, 1].set(0.5).at[0, 8].set(0.5)
    l_point = float(loss_distortion_dense(w_point, t0, t1)[0])
    l_spread = float(loss_distortion_dense(w_spread, t0, t1)[0])
    assert l_point < 0.01
    assert l_spread > l_point + 1.0


def test_procedural360_scene_and_env():
    """360 scene: directional env background, bkgd None, batch API."""
    import numpy as np

    from nerfacc_tpu.datasets import Procedural360Scene
    from nerfacc_tpu.datasets.procedural import env_color

    s = Procedural360Scene(n_views=3, width=16, height=16)
    assert s.bkgd is None
    assert s.images.shape == (3, 16, 16, 3)
    rays, px = s.sample_batch(32)
    assert px.shape == (32, 3)
    # env is direction-only: scaling the direction changes nothing
    d = jnp.asarray(np.random.RandomState(0).randn(8, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(env_color(d)), np.asarray(env_color(3.0 * d)), atol=1e-6
    )
    v = np.asarray(env_color(d))
    assert (v >= 0).all() and (v <= 1).all()
