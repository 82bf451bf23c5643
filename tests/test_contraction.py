"""Contraction goldens: closed-form checks + inverse round-trips
(reference tests/test_contraction.py oracles)."""

import numpy as np
import jax.numpy as jnp

from nerfacc_tpu import ContractionType, contract, contract_inv

ROI = jnp.array([-1.0, -2.0, -3.0, 1.0, 2.0, 3.0])


def test_aabb_closed_form():
    x = jnp.array(np.random.RandomState(0).uniform(-1, 1, size=(128, 3)), jnp.float32)
    got = contract(x, ROI, ContractionType.AABB)
    want = (x - ROI[:3]) / (ROI[3:] - ROI[:3])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    back = contract_inv(got, ROI, ContractionType.AABB)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_tanh_closed_form_and_roundtrip():
    x = jnp.array(np.random.RandomState(1).uniform(-5, 5, size=(128, 3)), jnp.float32)
    got = contract(x, ROI, ContractionType.UN_BOUNDED_TANH)
    u = (x - ROI[:3]) / (ROI[3:] - ROI[:3]) - 0.5
    want = jnp.tanh(u) * 0.5 + 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    back = contract_inv(got, ROI, ContractionType.UN_BOUNDED_TANH)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-2, atol=1e-2)


def test_sphere_roundtrip_and_range():
    x = jnp.array(np.random.RandomState(2).uniform(-8, 8, size=(256, 3)), jnp.float32)
    got = contract(x, ROI, ContractionType.UN_BOUNDED_SPHERE)
    # output always inside the unit sphere of [0,1]^3
    assert np.all(np.linalg.norm(np.asarray(got) - 0.5, axis=-1) <= 0.5 + 1e-5)
    # the roi's inscribed ball maps inside the [0.25, 0.75]^3 sphere
    u = np.random.RandomState(3).randn(64, 3)
    u = 0.9 * u / np.linalg.norm(u, axis=-1, keepdims=True) * np.random.RandomState(4).rand(64, 1)
    xin = jnp.array(u, jnp.float32) * jnp.array([1.0, 2.0, 3.0])
    gin = contract(xin, ROI, ContractionType.UN_BOUNDED_SPHERE)
    assert np.all(np.linalg.norm(np.asarray(gin) - 0.5, axis=-1) <= 0.25 + 1e-5)
    back = contract_inv(got, ROI, ContractionType.UN_BOUNDED_SPHERE)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-3, atol=1e-3)
