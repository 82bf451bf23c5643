"""Rendering-math goldens ported from reference tests/test_rendering.py,
plus gradient checks of the custom VJPs against jax numerical autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import (
    accumulate_along_rays,
    render_transmittance_from_density,
    render_visibility,
    render_weight_from_alpha,
    render_weight_from_density,
    rendering,
)

RAY_INDICES = jnp.array([0, 2, 2, 2, 2], jnp.int32)
ALPHAS = jnp.array([[0.4], [0.3], [0.8], [0.8], [0.5]], jnp.float32)


def test_render_visibility():
    # transmittance: [1.0, 1.0, 0.7, 0.14, 0.028]
    vis = render_visibility(
        ALPHAS, ray_indices=RAY_INDICES, n_rays=3, early_stop_eps=0.03, alpha_thre=0.0
    )
    np.testing.assert_array_equal(
        np.asarray(vis), np.array([True, True, True, True, False])
    )
    vis = render_visibility(
        ALPHAS, ray_indices=RAY_INDICES, n_rays=3, early_stop_eps=0.05, alpha_thre=0.35
    )
    np.testing.assert_array_equal(
        np.asarray(vis), np.array([True, False, True, True, False])
    )


def test_render_weight_from_alpha():
    weights = render_weight_from_alpha(ALPHAS, ray_indices=RAY_INDICES, n_rays=3)
    want = np.array(
        [[1.0 * 0.4], [1.0 * 0.3], [0.7 * 0.8], [0.14 * 0.8], [0.028 * 0.5]],
        np.float32,
    )
    np.testing.assert_allclose(np.asarray(weights), want, rtol=1e-5, atol=1e-6)


def test_render_weight_from_density_vs_alpha():
    rng = np.random.RandomState(0)
    sigmas = jnp.array(rng.rand(5, 1), jnp.float32)
    t_starts = jnp.array(rng.rand(5, 1), jnp.float32)
    t_ends = t_starts + jnp.array(rng.rand(5, 1), jnp.float32) + 1.0
    alphas = 1.0 - jnp.exp(-sigmas * (t_ends - t_starts))
    w_d = render_weight_from_density(
        t_starts, t_ends, sigmas, ray_indices=RAY_INDICES, n_rays=3
    )
    w_a = render_weight_from_alpha(alphas, ray_indices=RAY_INDICES, n_rays=3)
    np.testing.assert_allclose(np.asarray(w_d), np.asarray(w_a), rtol=1e-4, atol=1e-5)


def test_accumulate_along_rays():
    weights = jnp.array([[0.4], [0.3], [0.8], [0.8], [0.5]], jnp.float32)
    values = jnp.array(np.random.RandomState(1).rand(5, 2), jnp.float32)
    ray_values = accumulate_along_rays(
        weights, RAY_INDICES, values=values, n_rays=3
    )
    assert ray_values.shape == (3, 2)
    np.testing.assert_allclose(
        np.asarray(ray_values[0]), np.asarray(weights[0] * values[0]), rtol=1e-5
    )
    assert (np.asarray(ray_values[1]) == 0).all()
    np.testing.assert_allclose(
        np.asarray(ray_values[2]),
        np.asarray((weights[1:] * values[1:]).sum(axis=0)),
        rtol=1e-5,
    )


def test_rendering_smoke():
    def rgb_sigma_fn(t_starts, t_ends, ray_indices):
        return jnp.concatenate([t_starts] * 3, axis=-1), t_starts

    rng = np.random.RandomState(2)
    t_starts = jnp.array(rng.rand(5, 1), jnp.float32)
    t_ends = t_starts + 1.0
    colors, opacities, depths = rendering(
        t_starts, t_ends, RAY_INDICES, n_rays=3, rgb_sigma_fn=rgb_sigma_fn
    )
    assert colors.shape == (3, 3)
    assert opacities.shape == (3, 1)
    assert depths.shape == (3, 1)
    # background composition
    colors_b, _, _ = rendering(
        t_starts, t_ends, RAY_INDICES, n_rays=3, rgb_sigma_fn=rgb_sigma_fn,
        render_bkgd=jnp.ones(3),
    )
    want = np.asarray(colors) + np.asarray(1.0 - opacities)
    np.testing.assert_allclose(np.asarray(colors_b), want, rtol=1e-5, atol=1e-6)


def test_grads_golden():
    """Reference test_grads (tests/test_rendering.py:136-214): hand-computed
    weights + sigma-gradient goldens on a 2-live-ray packed fixture."""
    packed_info = jnp.array([[0, 1], [1, 0], [1, 4]], jnp.int32)
    sigmas = jnp.array([[0.4], [0.8], [0.1], [0.8], [0.1]], jnp.float32)
    t_starts = jnp.array(np.random.RandomState(3).rand(5, 1), jnp.float32)
    t_ends = t_starts + 1.0

    weights_ref = np.array(
        [[0.3297], [0.5507], [0.0428], [0.2239], [0.0174]], np.float32
    )
    sigmas_grad_ref = np.array(
        [[0.6703], [0.1653], [0.1653], [0.1653], [0.1653]], np.float32
    )

    def loss_trans(s, **kw):
        trans = render_transmittance_from_density(t_starts, t_ends, s, **kw)
        w = trans * (1.0 - jnp.exp(-s * (t_ends - t_starts)))
        return w.sum(), w

    for kw in (
        dict(ray_indices=RAY_INDICES, n_rays=3),
        dict(packed_info=packed_info),
    ):
        (_, w), g = jax.value_and_grad(
            lambda s: loss_trans(s, **kw), has_aux=True
        )(sigmas)
        np.testing.assert_allclose(np.asarray(w), weights_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g), sigmas_grad_ref, atol=1e-4)

    def loss_wd(s, **kw):
        w = render_weight_from_density(t_starts, t_ends, s, **kw)
        return w.sum(), w

    for kw in (
        dict(ray_indices=RAY_INDICES, n_rays=3),
        dict(packed_info=packed_info),
    ):
        (_, w), g = jax.value_and_grad(lambda s: loss_wd(s, **kw), has_aux=True)(sigmas)
        np.testing.assert_allclose(np.asarray(w), weights_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g), sigmas_grad_ref, atol=1e-4)

    def loss_wa(s, **kw):
        alphas = 1.0 - jnp.exp(-s * (t_ends - t_starts))
        w = render_weight_from_alpha(alphas, **kw)
        return w.sum(), w

    for kw in (
        dict(ray_indices=RAY_INDICES, n_rays=3),
        dict(packed_info=packed_info),
    ):
        (_, w), g = jax.value_and_grad(lambda s: loss_wa(s, **kw), has_aux=True)(sigmas)
        np.testing.assert_allclose(np.asarray(w), weights_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g), sigmas_grad_ref, atol=1e-4)


def test_custom_vjp_matches_numerical():
    """Closed-form backward == finite differences (several random fixtures)."""
    rng = np.random.RandomState(4)
    seg = jnp.array(np.sort(rng.randint(0, 4, size=12)), jnp.int32)
    sigmas = jnp.array(rng.rand(12, 1).astype(np.float32) + 0.05)
    t_starts = jnp.array(np.cumsum(rng.rand(12, 1).astype(np.float32), axis=0))
    t_ends = t_starts + 0.3
    probe = jnp.array(rng.rand(12, 1), jnp.float32)

    def f(s):
        return (
            render_weight_from_density(
                t_starts, t_ends, s, ray_indices=seg, n_rays=4
            )
            * probe
        ).sum()

    g = jax.grad(f)(sigmas)
    eps = 1e-3
    for i in [0, 3, 7, 11]:
        sp = sigmas.at[i, 0].add(eps)
        sm = sigmas.at[i, 0].add(-eps)
        fd = (f(sp) - f(sm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i, 0]), float(fd), rtol=2e-2, atol=1e-4)

    def fa(s):
        alphas = 1.0 - jnp.exp(-s * (t_ends - t_starts))
        return (
            render_weight_from_alpha(alphas, ray_indices=seg, n_rays=4) * probe
        ).sum()

    ga = jax.grad(fa)(sigmas)
    for i in [0, 5, 11]:
        sp = sigmas.at[i, 0].add(eps)
        sm = sigmas.at[i, 0].add(-eps)
        fd = (fa(sp) - fa(sm)) / (2 * eps)
        np.testing.assert_allclose(float(ga[i, 0]), float(fd), rtol=2e-2, atol=1e-4)


def test_masked_entries_are_inert():
    """Fixed-capacity contract: flipping values at masked slots changes nothing."""
    seg = jnp.array([0, 0, 1, 1, 1, 2, 2, 2], jnp.int32)
    masks = jnp.array([1, 1, 1, 0, 1, 1, 1, 0], bool)
    rng = np.random.RandomState(5)
    sigmas = jnp.array(rng.rand(8, 1), jnp.float32)
    t_starts = jnp.array(rng.rand(8, 1), jnp.float32)
    t_ends = t_starts + 0.5

    w1 = render_weight_from_density(
        t_starts, t_ends, sigmas, ray_indices=seg, n_rays=3, masks=masks
    )
    sigmas2 = jnp.where(masks[:, None], sigmas, 77.0)
    w2 = render_weight_from_density(
        t_starts, t_ends, sigmas2, ray_indices=seg, n_rays=3, masks=masks
    )
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)
    assert (np.asarray(w1)[~np.asarray(masks)] == 0).all()


def test_rendering_rgb_alpha_fn_matches_sigma_fn():
    """rendering() via the alpha callback equals the density callback when
    alpha = 1 - exp(-sigma * delta) (both reference contracts,
    vol_rendering.py:80-109)."""
    rng = np.random.RandomState(0)
    n_rays, n = 3, 12
    ray_indices = jnp.repeat(jnp.arange(n_rays, dtype=jnp.int32), n // n_rays)
    t_starts = jnp.asarray(np.sort(rng.rand(n)).reshape(-1, 1), jnp.float32)
    t_ends = t_starts + 0.05
    sigmas = jnp.asarray(rng.rand(n, 1) * 5, jnp.float32)
    rgbs = jnp.asarray(rng.rand(n, 3), jnp.float32)

    def rgb_sigma_fn(ts, te, ri):
        return rgbs, sigmas

    def rgb_alpha_fn(ts, te, ri):
        return rgbs, 1.0 - jnp.exp(-sigmas * (te - ts))

    c1, o1, d1 = rendering(
        t_starts, t_ends, ray_indices, n_rays,
        rgb_sigma_fn=rgb_sigma_fn, render_bkgd=jnp.ones(3),
    )
    c2, o2, d2 = rendering(
        t_starts, t_ends, ray_indices, n_rays,
        rgb_alpha_fn=rgb_alpha_fn, render_bkgd=jnp.ones(3),
    )
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-5)


def test_rendering_dense_rgb_alpha_fn():
    from nerfacc_tpu import rendering_dense

    rng = np.random.RandomState(1)
    R, K = 4, 8
    t_starts = jnp.asarray(np.sort(rng.rand(R, K), axis=1), jnp.float32)
    t_ends = t_starts + 0.05
    masks = jnp.asarray(rng.rand(R, K) < 0.8)
    rgbs = jnp.asarray(rng.rand(R, K, 3), jnp.float32)
    sigmas = jnp.asarray(rng.rand(R, K) * 5, jnp.float32)

    c1, o1, d1 = rendering_dense(
        t_starts, t_ends, masks,
        rgb_sigma_fn=lambda ts, te: (rgbs, sigmas),
        render_bkgd=jnp.ones(3),
    )
    c2, o2, d2 = rendering_dense(
        t_starts, t_ends, masks,
        rgb_alpha_fn=lambda ts, te: (rgbs, 1.0 - jnp.exp(-sigmas * (te - ts))),
        render_bkgd=jnp.ones(3),
    )
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)
