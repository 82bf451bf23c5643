"""Model smoke + property tests (shapes, activations, hash encoding)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models import (
    DNeRFRadianceField,
    HashEncoder,
    NGPRadianceField,
    SinusoidalEncoder,
    VanillaNeRFRadianceField,
    trunc_exp,
)


def test_sinusoidal_encoder_dims():
    enc = SinusoidalEncoder(x_dim=3, min_deg=0, max_deg=10, use_identity=True)
    x = jnp.ones((5, 3))
    out = enc.apply({}, x)
    assert out.shape == (5, enc.latent_dim) == (5, 63)
    # identity part preserved
    np.testing.assert_allclose(np.asarray(out[:, :3]), 1.0)


def test_vanilla_nerf_shapes():
    field = VanillaNeRFRadianceField(net_depth=2, net_width=32)
    x = jnp.zeros((7, 3))
    d = jnp.zeros((7, 3))
    params = field.init(jax.random.PRNGKey(0), x, d)
    rgb, sigma = field.apply(params, x, d)
    assert rgb.shape == (7, 3) and sigma.shape == (7, 1)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    assert (np.asarray(sigma) >= 0).all()
    dens = field.apply(params, x, method=field.query_density)
    assert dens.shape == (7, 1)
    op = field.apply(params, x, 0.01, method=field.query_opacity)
    np.testing.assert_allclose(np.asarray(op), np.asarray(dens) * 0.01, rtol=1e-6)


def test_trunc_exp_grad_clamped():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    # backward uses exp(min(x, 15))
    np.testing.assert_allclose(float(g), float(np.exp(15.0)), rtol=1e-5)
    g2 = jax.grad(lambda x: trunc_exp(x))(1.0)
    np.testing.assert_allclose(float(g2), float(np.exp(1.0)), rtol=1e-5)


def test_hash_encoder_smoke_and_locality():
    enc = HashEncoder(n_levels=4, log2_hashmap_size=12, base_resolution=4)
    x = jnp.asarray(np.random.RandomState(0).rand(16, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (16, 8)
    # continuity: nearby points get nearby encodings
    x2 = x + 1e-5
    out2 = enc.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)
    # differentiable wrt table
    def loss(p):
        return (enc.apply(p, x) ** 2).sum()
    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["params"]["table"])).all()


def test_ngp_field_selector_zeroes_outside():
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    field = NGPRadianceField(aabb=aabb, n_levels=4, log2_hashmap_size=12)
    x = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    params = field.init(jax.random.PRNGKey(0), x, d)
    rgb, sigma = field.apply(params, x, d)
    assert rgb.shape == (2, 3) and sigma.shape == (2, 1)
    assert float(sigma[1, 0]) == 0.0  # outside aabb -> zero density
    assert float(sigma[0, 0]) > 0.0


def test_ngp_unbounded_never_zero_selector():
    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    field = NGPRadianceField(
        aabb=aabb, unbounded=True, n_levels=4, log2_hashmap_size=12
    )
    x = jnp.asarray([[3.0, -2.0, 8.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    params = field.init(jax.random.PRNGKey(0), x, d)
    _, sigma = field.apply(params, x, d)
    assert float(sigma[0, 0]) > 0.0  # contraction brings it inside


def test_dnerf_field_shapes():
    field = DNeRFRadianceField()
    x = jnp.zeros((5, 3))
    t = jnp.zeros((5, 1))
    d = jnp.zeros((5, 3))
    params = field.init(jax.random.PRNGKey(0), x, t, d)
    rgb, sigma = field.apply(params, x, t, d)
    assert rgb.shape == (5, 3) and sigma.shape == (5, 1)
