"""Golden end-to-end render regression (the cross-round drift detector).

A fixed seeded TensoCP field + half-occupied grid + 6 rays, rendered
through the full pipeline (strided probes, grouped selection, visibility
culling, compositing). The literals below were produced by this exact
configuration; any silent numeric change to the march/render/encoder path
shows up here before it shows up as a PSNR regression. Analogue of the
reference's hand-computed golden tests (tests/test_rendering.py:136-214)
at whole-pipeline scope.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import create_grid, with_binary
from nerfacc_tpu.models import TensoCPRadianceField
from nerfacc_tpu.utils import render_rays

GOLDEN_COLORS = np.array(
    [
        [1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0],
        [0.834938, 0.866406, 0.843050],
        [0.869357, 0.870435, 0.868735],
        [1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0],
    ],
    np.float32,
)
GOLDEN_OPACITY = np.array([0.0, 0.0, 0.311616, 0.260006, 0.0, 0.0], np.float32)
GOLDEN_DEPTH = np.array([0.0, 0.0, 0.261278, 0.132488, 0.0, 0.0], np.float32)
GOLDEN_GRAD_SUM = 0.00075808
GOLDEN_GRAD_ABS = 0.00259945
GOLDEN_LIVE = 92


def _setup():
    rng = np.random.RandomState(7)
    n = 6
    rays_o = jnp.asarray(rng.rand(n, 3) * 2 - 1, jnp.float32)
    rays_d = jnp.asarray(rng.randn(n, 3), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    field = TensoCPRadianceField(aabb=(-1.0,) * 3 + (1.0,) * 3, levels=((16, 8),))
    params = field.init(
        jax.random.PRNGKey(3), jnp.zeros((2, 3)), jnp.zeros((2, 3))
    )
    binary = np.zeros((16, 16, 16), bool)
    binary[4:12, 4:12, 4:12] = True
    grid = with_binary(
        create_grid([-1.0] * 3 + [1.0] * 3, resolution=16), jnp.asarray(binary)
    )
    kwargs = dict(
        grid=grid, scene_aabb=jnp.asarray([-1.0] * 3 + [1.0] * 3),
        render_step_size=2e-2, max_samples_per_ray=128,
        coarse_stride=4, render_bkgd=jnp.ones(3),
    )
    return field, params, rays_o, rays_d, kwargs


def test_golden_forward():
    field, params, rays_o, rays_d, kwargs = _setup()
    colors, opac, depth, n_live = render_rays(
        params, field, rays_o, rays_d, **kwargs
    )
    # bf16 matmuls in the field: tolerances cover rounding-mode jitter but
    # not algorithmic changes
    np.testing.assert_allclose(np.asarray(colors), GOLDEN_COLORS,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(opac[:, 0]), GOLDEN_OPACITY,
                               rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(depth[:, 0]), GOLDEN_DEPTH,
                               rtol=5e-3, atol=2e-3)
    assert int(n_live) == GOLDEN_LIVE


def test_golden_gradients():
    field, params, rays_o, rays_d, kwargs = _setup()

    def loss(p):
        c, _, _, _ = render_rays(p, field, rays_o, rays_d, **kwargs)
        return jnp.sum(c * jnp.asarray([[0.3, 1.1, -0.7]]))

    g = jax.grad(loss)(params)["params"]["level0"]["axis0"]
    np.testing.assert_allclose(float(jnp.sum(g)), GOLDEN_GRAD_SUM,
                               rtol=5e-2, atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(g))), GOLDEN_GRAD_ABS,
                               rtol=5e-2, atol=1e-5)
