"""Pack/unpack round-trips + gradient-of-unpack == mask
(reference tests/test_pack.py:12-37)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import (
    pack_data,
    pack_info,
    unpack_data,
    unpack_info,
    unpack_info_to_mask,
)


def test_pack_info_unpack_info_roundtrip():
    ray_indices = jnp.array([0, 0, 0, 2, 2, 4], jnp.int32)
    info = pack_info(ray_indices, n_rays=5)
    np.testing.assert_array_equal(
        np.asarray(info), np.array([[0, 3], [3, 0], [3, 2], [5, 0], [5, 1]])
    )
    back = unpack_info(info, n_samples=6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ray_indices))


def test_pack_data_roundtrip():
    rng = np.random.RandomState(0)
    data = jnp.array(rng.rand(10, 3, 4), jnp.float32)
    mask = jnp.array(rng.rand(10, 3) > 0.5)
    packed, info, valid = pack_data(data, mask)
    dense = np.asarray(unpack_data(info, packed, n_samples=3))
    # each ray's kept samples, left-justified; the rest zero
    data_np, mask_np = np.asarray(data), np.asarray(mask)
    for r in range(10):
        kept = data_np[r][mask_np[r]]
        np.testing.assert_allclose(dense[r, : len(kept)], kept, rtol=1e-6)
        assert (dense[r, len(kept):] == 0).all()
    assert int(valid.sum()) == int(mask.sum())


def test_unpack_info_to_mask():
    info = jnp.array([[0, 2], [2, 0], [2, 3]], jnp.int32)
    mask = unpack_info_to_mask(info, n_samples=4)
    want = np.array(
        [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 0]], bool
    )
    np.testing.assert_array_equal(np.asarray(mask), want)


def test_unpack_data_grad_is_mask():
    info = jnp.array([[0, 2], [2, 1]], jnp.int32)
    data = jnp.array([[1.0], [2.0], [3.0]], jnp.float32)

    def f(d):
        return unpack_data(info, d, n_samples=3).sum()

    g = jax.grad(f)(data)
    np.testing.assert_allclose(np.asarray(g), np.ones((3, 1)), rtol=1e-6)
