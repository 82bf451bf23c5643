"""Scatter-free compact training outputs == expanded path, exactly.

``render_rays(return_compact=True, aux=...)`` skips the expand-back
scatter; a full-batch loss is recovered algebraically because non-hit
rays render exactly the background. These tests pin the loss AND
gradient equality (the contract bench.py and fast training loops rely
on).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu import create_grid, with_binary
from nerfacc_tpu.models import TensoCPRadianceField
from nerfacc_tpu.utils import render_rays


def _setup(n_rays=192, K=12):
    aabb = jnp.asarray([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    field = TensoCPRadianceField(
        aabb=tuple(map(float, np.asarray(aabb))), levels=((16, 8), (32, 16))
    )
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )
    grid = create_grid(aabb, resolution=32, occupied=True)
    b = np.zeros((32, 32, 32), bool)
    b[8:24, 8:24, 8:24] = True
    grid = with_binary(grid, jnp.asarray(b))
    r = np.random.RandomState(3)
    o = jnp.asarray(r.rand(n_rays, 3) * 2 - 1, jnp.float32)
    d = jnp.asarray(r.randn(n_rays, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    px = jnp.asarray(r.rand(n_rays, 3), jnp.float32)
    kw = dict(
        scene_aabb=aabb, render_step_size=2e-2, max_samples_per_ray=256,
        samples_budget=n_rays * K, coarse_stride=16, probe_dilation=2,
        compact_rays_fraction=0.75,
    )
    return field, params, grid, o, d, px, kw


@pytest.mark.slow
def test_compact_loss_and_grads_match_expanded():
    field, params, grid, o, d, px, kw = _setup()
    bkgd = jnp.ones(3)

    def loss_full(p):
        colors, _, _, _ = render_rays(
            p, field, o, d, grid=grid, render_bkgd=bkgd, **kw
        )
        return jnp.mean((colors - px) ** 2)

    def loss_compact(p):
        colors, _, _, _, sel = render_rays(
            p, field, o, d, grid=grid, render_bkgd=bkgd,
            aux=px, return_compact=True, **kw
        )
        ph, okm = sel["aux"], sel["ray_ok"][:, None]
        sh = jnp.sum(jnp.where(okm, (colors - ph) ** 2, 0.0))
        sbg = jnp.sum((1.0 - px) ** 2) - jnp.sum(
            jnp.where(okm, (1.0 - ph) ** 2, 0.0)
        )
        return (sh + sbg) / px.size

    lf, gf = jax.value_and_grad(loss_full)(params)
    lc, gc = jax.value_and_grad(loss_compact)(params)
    np.testing.assert_allclose(float(lf), float(lc), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_compact_without_compaction_is_identity():
    # return_compact with compaction off: ray_indices is just arange
    field, params, grid, o, d, px, kw = _setup()
    kw.pop("compact_rays_fraction")
    colors_e, opac_e, _, n_e = render_rays(
        params, field, o, d, grid=grid, render_bkgd=jnp.ones(3), **kw
    )
    colors_c, opac_c, _, n_c, sel = render_rays(
        params, field, o, d, grid=grid, render_bkgd=jnp.ones(3),
        return_compact=True, **kw
    )
    assert int(n_e) == int(n_c)
    np.testing.assert_array_equal(
        np.asarray(sel["ray_indices"]), np.arange(o.shape[0])
    )
    assert np.asarray(sel["ray_ok"]).all()
    np.testing.assert_allclose(
        np.asarray(colors_e), np.asarray(colors_c), atol=1e-7
    )
