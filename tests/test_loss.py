"""Distortion loss: O(S) scan form == dense O(S^2) oracle
(reference tests/test_loss.py, strengthened from shape-only)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import loss_distortion, pack_info, ray_marching


def _dense_distortion(w, t1, t2):
    interval = t2 - t1
    tmid = (t1 + t2) / 2
    loss_uni = (1 / 3) * (interval * w**2).sum(-1)
    ww = w[..., :, None] * w[..., None, :]
    mm = np.abs(tmid[..., :, None] - tmid[..., None, :])
    return loss_uni + (ww * mm).sum((-1, -2))


def test_distortion_matches_dense_oracle():
    rng = np.random.RandomState(0)
    n_rays, S = 4, 16
    t = np.sort(rng.rand(n_rays, S + 1), axis=-1).astype(np.float32)
    t1, t2 = t[:, :-1], t[:, 1:]
    w = rng.rand(n_rays, S).astype(np.float32)

    ray_indices = jnp.repeat(jnp.arange(n_rays, dtype=jnp.int32), S)
    loss = loss_distortion(
        None,
        jnp.array(w.reshape(-1)),
        jnp.array(t1.reshape(-1, 1)),
        jnp.array(t2.reshape(-1, 1)),
        ray_indices=ray_indices,
        n_rays=n_rays,
    )
    want = _dense_distortion(w, t1, t2)
    np.testing.assert_allclose(np.asarray(loss), want, rtol=1e-4, atol=1e-5)


def test_distortion_shape_from_marching():
    rng = np.random.RandomState(1)
    rays_o = jnp.array(rng.rand(32, 3), jnp.float32)
    rays_d = jnp.array(rng.randn(32, 3), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    ray_indices, t_starts, t_ends, masks = ray_marching(
        rays_o, rays_d, near_plane=0.1, far_plane=1.0,
        render_step_size=1e-2, max_samples_per_ray=128,
    )
    weights = jnp.array(rng.rand(t_starts.shape[0]), jnp.float32)
    loss = loss_distortion(
        None, weights, t_starts, t_ends,
        ray_indices=ray_indices, n_rays=32, masks=masks,
    )
    assert loss.shape == (32,)
    assert np.isfinite(np.asarray(loss)).all()


def test_distortion_differentiable():
    t1 = jnp.array([[0.0], [0.5], [0.0]], jnp.float32)
    t2 = t1 + 0.5
    seg = jnp.array([0, 0, 1], jnp.int32)

    def f(w):
        return loss_distortion(None, w, t1, t2, ray_indices=seg, n_rays=2).sum()

    g = jax.grad(f)(jnp.array([0.3, 0.4, 0.2], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
