"""Geometric invariant: AABB intersection entry/exit points lie in the box
(reference tests/test_intersection.py:16-20)."""

import numpy as np
import jax.numpy as jnp

from nerfacc_tpu import ray_aabb_intersect


def test_intersection_points_inside_box():
    rng = np.random.RandomState(0)
    rays_o = jnp.array(rng.rand(128, 3), jnp.float32)
    rays_d = jnp.array(rng.randn(128, 3), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])

    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, aabb)
    hit = np.asarray(t_max) < 1e10
    assert hit.any()
    p_in = np.asarray(rays_o + t_min[:, None] * rays_d)[hit]
    p_out = np.asarray(rays_o + t_max[:, None] * rays_d)[hit]
    eps = 1e-4
    assert (p_in >= -1 - eps).all() and (p_in <= 1 + eps).all()
    assert (p_out >= -1 - eps).all() and (p_out <= 1 + eps).all()


def test_miss_gets_sentinel():
    rays_o = jnp.array([[5.0, 5.0, 5.0]])
    rays_d = jnp.array([[1.0, 0.0, 0.0]])
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, aabb)
    assert float(t_min[0]) == 1e10 and float(t_max[0]) == 1e10


def test_tmin_clamped_nonnegative():
    # origin inside the box -> entry at t=0
    rays_o = jnp.array([[0.0, 0.0, 0.0]])
    rays_d = jnp.array([[1.0, 0.0, 0.0]])
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, aabb)
    assert float(t_min[0]) == 0.0
    np.testing.assert_allclose(float(t_max[0]), 1.0, rtol=1e-5)
