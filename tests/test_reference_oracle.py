"""Full-pipeline parity vs the reference-faithful numpy oracle.

BASELINE.json north star: "forward/backward verified allclose against
reference rendered images + pixel gradients". ``reference_oracle.py``
transliterates the reference's serial CUDA algorithms
(``cuda/csrc/ray_marching.cu:81-192``, ``render_weight.cu:7-153``,
``render_transmittance.cu:7-145``) into numpy; these tests march, render
and differentiate a fixture scene through BOTH implementations and assert
allclose — the closest achievable form of the north star without CUDA
hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_oracle as oracle
from nerfacc_tpu import (
    accumulate_along_rays,
    create_grid,
    ray_aabb_intersect,
    ray_marching,
    render_transmittance_from_density,
    render_weight_from_density,
    with_binary,
)

AABB = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
RES = 16
STEP = 5e-3


def _fixture_rays(n_rays, seed=11):
    """Rays from outside the box aimed at interior targets (all hit)."""
    rng = np.random.RandomState(seed)
    theta = rng.rand(n_rays) * 2 * np.pi
    phi = np.arccos(rng.rand(n_rays) * 2 - 1)
    origins = 0.5 + 2.0 * np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=1,
    )
    targets = 0.25 + 0.5 * rng.rand(n_rays, 3)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return origins.astype(np.float32), dirs.astype(np.float32)


def _fixture_binary(seed=5, density=0.35):
    """Sparse blobby occupancy: a few solid spheres on the grid."""
    rng = np.random.RandomState(seed)
    g = np.linspace(0, 1, RES, endpoint=False) + 0.5 / RES
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    binary = np.zeros((RES, RES, RES), bool)
    for _ in range(5):
        c = rng.rand(3) * 0.8 + 0.1
        r = 0.08 + rng.rand() * 0.18
        binary |= (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2 < r**2
    assert 0.02 < binary.mean() < 0.6
    return binary


def _march_repo(rays_o, rays_d, binary, cone_angle=0.0):
    grid = with_binary(
        create_grid(list(AABB), resolution=RES), jnp.asarray(binary)
    )
    packed = ray_marching(
        jnp.asarray(rays_o),
        jnp.asarray(rays_d),
        scene_aabb=jnp.asarray(AABB, jnp.float32),
        grid=grid,
        render_step_size=STEP,
        cone_angle=cone_angle,
        max_samples_per_ray=512,
    )
    return packed


def _unpack_valid(packed, n_rays):
    """PackedSamples -> per-ray python lists of (t0, t1)."""
    ri = np.asarray(packed.ray_indices)
    ts = np.asarray(packed.t_starts).reshape(-1)
    te = np.asarray(packed.t_ends).reshape(-1)
    m = np.asarray(packed.masks)
    out = [[] for _ in range(n_rays)]
    for i in np.nonzero(m)[0]:
        out[ri[i]].append((ts[i], te[i]))
    return out


def _march_oracle(rays_o, rays_d, binary, cone_angle=0.0):
    t_min, t_max = ray_aabb_intersect(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(AABB, jnp.float32)
    )
    ri, ts, te = oracle.ray_marching(
        rays_o,
        rays_d,
        np.asarray(t_min, np.float64),
        np.asarray(t_max, np.float64),
        AABB,
        binary,
        STEP,
        cone_angle=cone_angle,
    )
    out = [[] for _ in range(rays_o.shape[0])]
    for k in range(len(ri)):
        out[ri[k]].append((ts[k], te[k]))
    return out


def test_march_parity_cone0_sparse_grid():
    """cone_angle=0, sparse occupancy: sample sets identical to the
    reference's serial DDA march (its skip is lattice-preserving at
    cone 0 — ``ray_marching.cu:59-75``)."""
    n_rays = 48
    rays_o, rays_d = _fixture_rays(n_rays)
    binary = _fixture_binary()
    repo = _unpack_valid(_march_repo(rays_o, rays_d, binary), n_rays)
    ref = _march_oracle(rays_o, rays_d, binary)

    total = 0
    for r in range(n_rays):
        assert len(repo[r]) == len(ref[r]), (
            f"ray {r}: {len(repo[r])} samples vs oracle {len(ref[r])}"
        )
        total += len(ref[r])
        for (a0, a1), (b0, b1) in zip(repo[r], ref[r]):
            np.testing.assert_allclose(a0, b0, atol=5e-5, rtol=1e-5)
            np.testing.assert_allclose(a1, b1, atol=5e-5, rtol=1e-5)
    assert total > 500  # the fixture must actually exercise occupancy


def test_march_parity_cone_full_grid():
    """cone_angle>0 with full occupancy: no skips happen, so the
    documented skip-clock divergence is out of play and the lattice must
    match the reference recurrence ``t += clamp(t*cone, dt, 1e10)``."""
    n_rays = 16
    rays_o, rays_d = _fixture_rays(n_rays, seed=3)
    binary = np.ones((RES, RES, RES), bool)
    repo = _unpack_valid(
        _march_repo(rays_o, rays_d, binary, cone_angle=0.004), n_rays
    )
    ref = _march_oracle(rays_o, rays_d, binary, cone_angle=0.004)
    for r in range(n_rays):
        assert abs(len(repo[r]) - len(ref[r])) <= 1, (
            f"ray {r}: {len(repo[r])} vs {len(ref[r])}"
        )
        for (a0, a1), (b0, b1) in zip(repo[r], ref[r]):
            np.testing.assert_allclose(a0, b0, atol=1e-4, rtol=2e-5)
            np.testing.assert_allclose(a1, b1, atol=1e-4, rtol=2e-5)


def _analytic_field(ts, te, ray_indices, rays_o, rays_d):
    """Deterministic sigma/rgb from sample midpoints (no network)."""
    mid = (ts + te) * 0.5
    x = rays_o[ray_indices] + mid[:, None] * rays_d[ray_indices]
    sigma = 30.0 * np.exp(-10.0 * np.sum((x - 0.5) ** 2, axis=1))
    rgb = 0.5 + 0.5 * np.sin(7.0 * x + np.array([0.0, 2.1, 4.2]))
    return sigma.astype(np.float64), rgb.astype(np.float64)


def test_render_image_and_pixel_grads_vs_oracle():
    """Image + pixel-gradient allclose on the marched fixture scene.

    The repo pipeline (flat custom-vjp scans) and the oracle (serial
    reference loops) get the SAME packed sample set and the same analytic
    field values; forward images and dL/dsigma, dL/drgb must agree."""
    n_rays = 48
    rays_o, rays_d = _fixture_rays(n_rays)
    binary = _fixture_binary()
    packed = _march_repo(rays_o, rays_d, binary)

    m = np.asarray(packed.masks)
    ri = np.asarray(packed.ray_indices)
    ts = np.asarray(packed.t_starts).reshape(-1)
    te = np.asarray(packed.t_ends).reshape(-1)

    sigmas, rgbs = _analytic_field(ts, te, ri, rays_o, rays_d)
    sigmas = np.where(m, sigmas, 0.0)  # invalid slots are vacuum
    bkgd = np.array([1.0, 1.0, 1.0])
    rng = np.random.RandomState(0)
    G = rng.rand(n_rays, 3)  # fixed linear loss: L = sum(colors * G)

    # ---- repo pipeline (f32, jit) ----
    def loss_fn(sig, rgb):
        w = render_weight_from_density(
            jnp.asarray(ts[:, None], jnp.float32),
            jnp.asarray(te[:, None], jnp.float32),
            sig,
            ray_indices=jnp.asarray(ri),
            n_rays=n_rays,
            masks=jnp.asarray(m),
        )
        colors = accumulate_along_rays(
            w, jnp.asarray(ri), values=rgb, n_rays=n_rays,
            masks=jnp.asarray(m),
        )
        opac = accumulate_along_rays(
            w, jnp.asarray(ri), n_rays=n_rays, masks=jnp.asarray(m)
        )
        colors = colors + (1.0 - opac) * jnp.asarray(bkgd, jnp.float32)
        loss = jnp.sum(colors * jnp.asarray(G, jnp.float32))
        return loss, colors

    (loss, colors), (d_sig, d_rgb) = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    )(jnp.asarray(sigmas, jnp.float32), jnp.asarray(rgbs, jnp.float32))

    # ---- oracle (f64, serial reference algorithms) ----
    # compact to valid samples only (the oracle has no mask concept)
    order = np.nonzero(m)[0]
    ri_v, ts_v, te_v = ri[order], ts[order], te[order]
    sig_v, rgb_v = sigmas[order], rgbs[order]
    pinfo = oracle.pack_info(ri_v, n_rays)
    colors_o, opac_o, _, weights_o = oracle.rendering_forward(
        pinfo, ri_v, ts_v.astype(np.float64), te_v.astype(np.float64),
        sig_v, rgb_v, n_rays, render_bkgd=bkgd,
    )
    d_sig_o, d_rgb_o = oracle.rendering_backward(
        pinfo, ri_v, ts_v.astype(np.float64), te_v.astype(np.float64),
        sig_v, rgb_v, weights_o, G, n_rays, render_bkgd=bkgd,
    )

    np.testing.assert_allclose(
        np.asarray(colors), colors_o, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d_rgb)[order], d_rgb_o, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d_sig)[order], d_sig_o, atol=2e-5, rtol=2e-4
    )
    # invalid slots must receive exactly zero gradient
    inv = ~m
    assert np.all(np.asarray(d_sig)[inv] == 0.0)


def test_transmittance_fwd_bwd_vs_oracle_serial():
    """Flat transmittance custom-vjp vs the reference's serial per-ray
    loops (``render_transmittance.cu:7-82``) on an irregular packed set."""
    rng = np.random.RandomState(2)
    n_rays = 32
    counts = rng.randint(0, 40, n_rays)
    ri = np.repeat(np.arange(n_rays), counts).astype(np.int32)
    n = len(ri)
    ts = np.sort(rng.rand(n).astype(np.float32))
    te = ts + 0.01
    sig = (rng.rand(n) * 30).astype(np.float32)
    g = rng.rand(n).astype(np.float32)
    pinfo = oracle.pack_info(ri, n_rays)

    def f(s):
        return render_transmittance_from_density(
            jnp.asarray(ts[:, None]), jnp.asarray(te[:, None]), s,
            ray_indices=jnp.asarray(ri), n_rays=n_rays,
        )

    trans, vjp = jax.vjp(f, jnp.asarray(sig[:, None]))
    (d_sig,) = vjp(jnp.asarray(g[:, None]))

    trans_o = oracle.transmittance_from_sigma(
        pinfo, ts.astype(np.float64), te.astype(np.float64),
        sig.astype(np.float64),
    )
    d_sig_o = oracle.grad_sigmas_from_transmittance(
        pinfo, ts.astype(np.float64), te.astype(np.float64), trans_o,
        g.astype(np.float64),
    )
    np.testing.assert_allclose(
        np.asarray(trans).reshape(-1), trans_o, atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_sig).reshape(-1), d_sig_o, atol=1e-5, rtol=1e-4
    )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
