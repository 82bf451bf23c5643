"""Native raygen == jnp reference ray generation."""

import numpy as np
import jax.numpy as jnp
import pytest

from nerfacc_tpu import data_io
from nerfacc_tpu.datasets.rays import generate_rays, look_at_poses


@pytest.mark.skipif(data_io.lib() is None, reason="no g++ available")
def test_rays_for_pose_matches_jnp():
    h, w = 12, 16
    poses = np.asarray(look_at_poses(3, radius=2.0))
    K = np.array([20.0, 20.0, w / 2, h / 2], np.float32)
    o_n, d_n = data_io.rays_for_pose(h, w, poses[1], K, opengl=True)

    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    Km = jnp.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    rays = generate_rays(x.reshape(-1), y.reshape(-1), jnp.asarray(poses[1]), Km)
    np.testing.assert_allclose(o_n, np.asarray(rays.origins), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d_n, np.asarray(rays.viewdirs), rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(data_io.lib() is None, reason="no g++ available")
def test_sample_ray_batch_composites_and_normalizes():
    rng = np.random.RandomState(0)
    images = rng.rand(2, 8, 8, 4).astype(np.float32)
    poses = np.asarray(look_at_poses(2, radius=2.0))
    K = np.array([10.0, 10.0, 4.0, 4.0], np.float32)
    bkgd = np.array([1.0, 1.0, 1.0], np.float32)
    o, d, px = data_io.sample_ray_batch(images, poses, K, bkgd, seed=7, num_rays=64)
    assert o.shape == (64, 3) and d.shape == (64, 3) and px.shape == (64, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)
    # pixels are convex combos of image rgb and bkgd -> within [0, 1]
    assert (px >= 0).all() and (px <= 1.0 + 1e-6).all()
    # deterministic per seed
    o2, d2, px2 = data_io.sample_ray_batch(images, poses, K, bkgd, seed=7, num_rays=64)
    np.testing.assert_array_equal(px, px2)
    o3, _, _ = data_io.sample_ray_batch(images, poses, K, bkgd, seed=8, num_rays=64)
    assert not np.array_equal(o, o3)
