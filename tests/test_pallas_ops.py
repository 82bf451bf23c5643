"""Pallas kernel correctness vs the pure-XLA reference paths (interpret
mode on the CPU test mesh; the same kernels compile for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models import hat_basis
from nerfacc_tpu.ops import cp_level_features, cp_level_features_res


def _xla_cp(xu, t0, t1, t2):
    feats = None
    for axis, t in enumerate((t0, t1, t2)):
        basis = hat_basis(xu[:, axis], t.shape[0]).astype(jnp.bfloat16)
        u = jnp.dot(basis, t.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        feats = u if feats is None else feats * u
    return feats


def _fixture(B=300, G=33, R=8, seed=0):
    rng = np.random.RandomState(seed)
    xu = jnp.asarray(rng.rand(B, 3), jnp.float32)
    ts = [jnp.asarray(rng.randn(G, R) * 0.2, jnp.float32) for _ in range(3)]
    return xu, ts


def test_cp_kernel_matches_xla():
    xu, (t0, t1, t2) = _fixture()
    got = cp_level_features(xu, t0, t1, t2)
    want = _xla_cp(xu, t0, t1, t2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-5)


def test_cp_kernel_grad_matches_xla():
    xu, (t0, t1, t2) = _fixture(seed=1)
    w = jnp.asarray(np.random.RandomState(2).randn(8), jnp.float32)

    def loss_k(t0, t1, t2):
        return jnp.sum(cp_level_features(xu, t0, t1, t2) * w)

    def loss_x(t0, t1, t2):
        return jnp.sum(_xla_cp(xu, t0, t1, t2) * w)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(t0, t1, t2)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(t0, t1, t2)
    for a, b in zip(gk, gx):
        # both paths do bf16 matmuls; small elementwise bf16 deviations
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=2e-3)


def test_cp_kernel_batch_padding():
    # B not a multiple of the kernel block size
    xu, (t0, t1, t2) = _fixture(B=1500, seed=3)
    got = cp_level_features(xu, t0, t1, t2)
    want = _xla_cp(xu, t0, t1, t2)
    assert got.shape == (1500, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-5)


def test_cp_kernel_res_matches_xla():
    # residual-saving variant: identical forward, backward from saved u's
    xu, (t0, t1, t2) = _fixture(B=1500, seed=5)
    got = cp_level_features_res(xu, t0, t1, t2)
    want = _xla_cp(xu, t0, t1, t2)
    assert got.shape == (1500, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-5)

    w = jnp.asarray(np.random.RandomState(6).randn(8), jnp.float32)

    def loss_k(t0, t1, t2):
        return jnp.sum(cp_level_features_res(xu, t0, t1, t2) * w)

    def loss_x(t0, t1, t2):
        return jnp.sum(_xla_cp(xu, t0, t1, t2) * w)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(t0, t1, t2)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(t0, t1, t2)
    for a, b in zip(gk, gx):
        # the residual u is the f32-accumulated dot rounded once to bf16;
        # the XLA reference rounds inside the bf16 dot — one extra ulp
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=4e-3)


def test_tensocp_model_kernel_vs_xla():
    from nerfacc_tpu.models import TensoCPRadianceField

    aabb = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(64, 3) * 2 - 1, jnp.float32)
    d = jnp.asarray(rng.randn(64, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    fk = TensoCPRadianceField(aabb=aabb, levels=((16, 8),), use_kernel=True)
    fx = TensoCPRadianceField(aabb=aabb, levels=((16, 8),), use_kernel=False)
    params = fk.init(jax.random.PRNGKey(0), x, d)
    rgb_k, sig_k = fk.apply(params, x, d)
    rgb_x, sig_x = fx.apply(params, x, d)
    np.testing.assert_allclose(np.asarray(rgb_k), np.asarray(rgb_x),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_k), np.asarray(sig_x),
                               rtol=1e-3, atol=1e-5)


def test_hash_grad_scatter_matches_xla():
    from nerfacc_tpu.ops.hash_gather import hash_grad_scatter

    rng = np.random.RandomState(7)
    T, B = 512, 3000
    idx = jnp.asarray(rng.randint(0, T, B), jnp.int32)
    # include padding markers (-1 rows must be skipped)
    idx = idx.at[::17].set(-1)
    v = jnp.asarray(rng.randn(B, 2), jnp.float32)
    got = hash_grad_scatter(idx, v, T)
    want = jnp.zeros((T, 2)).at[jnp.where(idx >= 0, idx, 0)].add(
        jnp.where(idx[:, None] >= 0, v, 0.0)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_hash_encoder_pallas_grad_matches_xla():
    from nerfacc_tpu.models import HashEncoder

    rng = np.random.RandomState(8)
    # 203 samples: NOT a multiple of 8 — regression check for the round-2
    # advisor finding (the packed reshape crashed unless N % 8 == 0)
    x = jnp.asarray(rng.rand(203, 3), jnp.float32)
    g = jnp.asarray(rng.randn(203, 8), jnp.float32)
    kw = dict(n_levels=4, log2_hashmap_size=10, base_resolution=4)
    enc_p = HashEncoder(pallas_grad=True, **kw)
    enc_x = HashEncoder(pallas_grad=False, **kw)
    params = enc_p.init(jax.random.PRNGKey(0), x)

    out_p = enc_p.apply(params, x)
    out_x = enc_x.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)

    def loss(enc):
        def f(p):
            return jnp.sum(enc.apply(p, x) * g)
        return f

    gp = jax.grad(loss(enc_p))(params)
    gx = jax.grad(loss(enc_x))(params)
    np.testing.assert_allclose(
        np.asarray(gp["params"]["table"]), np.asarray(gx["params"]["table"]),
        rtol=1e-4, atol=1e-6,
    )


def test_fused_select_grouped_matches_xla():
    # the fused march-select kernel vs the unfused select_slots_grouped +
    # _lattice_t path, over both cone regimes and ragged ray counts
    from nerfacc_tpu.ops.march_select import fused_select_grouped
    from nerfacc_tpu.ray_marching import _lattice_t, select_slots_grouped

    rng = np.random.RandomState(4)
    R, G, K, C = 300, 32, 24, 16
    for cone in (0.0, 0.004):
        live = jnp.asarray(
            rng.randint(0, C + 1, size=(R, G))
            * (rng.rand(R, G) < 0.4),
            jnp.int32,
        )
        gsize = jnp.asarray(rng.randint(1, C + 1, size=(R, 1)), jnp.int32)
        live = jnp.minimum(live, gsize)
        t_min = jnp.asarray(rng.rand(R) * 0.5 + 0.05, jnp.float32)
        step, dt_max = 5e-3, 1e10

        pos, ok, scale = select_slots_grouped(live, gsize, K)
        lat = lambda k: _lattice_t(t_min[:, None], k.astype(jnp.float32),
                                   step, cone, dt_max)
        want_ts, want_te = lat(pos), lat(pos + 1)
        want_dt = lat(pos + scale) - want_ts

        ts, te, dt, got_ok = fused_select_grouped(
            live, gsize, t_min, k_slots=K, step_size=step,
            cone_angle=cone, dt_max=dt_max,
        )
        # tolerances at f32-FMA scale: XLA contracts mul-adds, the
        # interpreter does not — ~1e-7 relative noise, not a logic gap
        np.testing.assert_array_equal(np.asarray(got_ok), np.asarray(ok))
        np.testing.assert_allclose(np.asarray(ts), np.asarray(want_ts),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(te), np.asarray(want_te),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dt), np.asarray(want_dt),
                                   rtol=1e-5, atol=1e-6)


def test_march_rays_pallas_path_matches_xla():
    # whole-march equivalence: use_pallas=True vs False through march_rays
    from nerfacc_tpu import create_grid, with_binary
    from nerfacc_tpu.ray_marching import march_rays

    rng = np.random.RandomState(5)
    n = 64
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    binary = np.zeros((32, 32, 32), bool)
    binary[8:24, 8:24, 8:24] = True
    grid = with_binary(create_grid(aabb, resolution=32), jnp.asarray(binary))
    rays_o = jnp.asarray(rng.rand(n, 3) * 2 - 1, jnp.float32) * 1.4
    d = rng.randn(n, 3)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                         jnp.float32)
    t_min = jnp.zeros((n,), jnp.float32)
    t_max = jnp.full((n,), 4.0, jnp.float32)
    kw = dict(render_step_size=1e-2, max_samples_per_ray=512,
              slots_per_ray=32, coarse_stride=8, probe_dilation=1,
              probe_groups=16)
    a = march_rays(rays_o, rays_d, t_min, t_max, grid, use_pallas=True, **kw)
    b = march_rays(rays_o, rays_d, t_min, t_max, grid, use_pallas=False, **kw)
    np.testing.assert_array_equal(np.asarray(a.masks), np.asarray(b.masks))
    np.testing.assert_allclose(np.asarray(a.t_starts), np.asarray(b.t_starts),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.deltas), np.asarray(b.deltas),
                               rtol=1e-5, atol=1e-6)


def test_fused_reselect_matches_xla():
    from nerfacc_tpu.ray_marching import RaySegments, reselect_visible

    rng = np.random.RandomState(6)
    R, K, K2 = 200, 48, 16
    masks = jnp.asarray(rng.rand(R, K) < 0.3)
    ts = jnp.asarray(np.sort(rng.rand(R, K), axis=1), jnp.float32)
    dt = jnp.asarray(rng.rand(R, K) * 0.01 + 1e-3, jnp.float32)
    segs = RaySegments(t_starts=ts, t_ends=ts + dt, deltas=dt, masks=masks)
    a = reselect_visible(segs, K2, use_pallas=True)
    b = reselect_visible(segs, K2, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a.masks), np.asarray(b.masks))
    for x, y in ((a.t_starts, b.t_starts), (a.t_ends, b.t_ends),
                 (a.deltas, b.deltas)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_fused_select_grouped_padding_path():
    # R > BLK exercises the grid + tail-padding path
    from nerfacc_tpu.ops.march_select import fused_select_grouped
    from nerfacc_tpu.ray_marching import _lattice_t, select_slots_grouped

    rng = np.random.RandomState(8)
    R, G, K, C = 1300, 16, 8, 8
    live = jnp.asarray(
        rng.randint(0, C + 1, size=(R, G)) * (rng.rand(R, G) < 0.5),
        jnp.int32,
    )
    gsize = jnp.asarray(rng.randint(1, C + 1, size=(R, 1)), jnp.int32)
    live = jnp.minimum(live, gsize)
    t_min = jnp.asarray(rng.rand(R), jnp.float32)
    pos, ok, scale = select_slots_grouped(live, gsize, K)
    ts, te, dt, got_ok = fused_select_grouped(
        live, gsize, t_min, k_slots=K, step_size=1e-2,
    )
    assert ts.shape == (R, K)
    np.testing.assert_array_equal(np.asarray(got_ok), np.asarray(ok))
    want_ts = _lattice_t(t_min[:, None], pos.astype(jnp.float32), 1e-2, 0.0)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(want_ts),
                               rtol=1e-5, atol=1e-6)
