"""Ray-marching invariants (reference tests/test_ray_marching.py) plus
static-shape sampler specifics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu import create_grid, ray_marching, with_binary


def _rand_rays(n=32, seed=0):
    rng = np.random.RandomState(seed)
    rays_o = jnp.array(rng.rand(n, 3), jnp.float32)
    rays_d = jnp.array(rng.randn(n, 3), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d


def test_near_far_marching():
    rays_o, rays_d = _rand_rays()
    ray_indices, t_starts, t_ends, masks = ray_marching(
        rays_o, rays_d, near_plane=0.1, far_plane=1.0,
        render_step_size=1e-2, max_samples_per_ray=128,
    )
    m = np.asarray(masks)
    assert m.any()
    ts = np.asarray(t_starts)[:, 0][m]
    te = np.asarray(t_ends)[:, 0][m]
    assert (ts >= 0.1 - 1e-5).all()
    mid = (ts + te) / 2
    assert (mid <= 1.0 + 1e-5).all()
    assert (te > ts).all()
    # ray_indices sorted
    ri = np.asarray(ray_indices)[m]
    assert (np.diff(ri) >= 0).all()


def test_samples_inside_grid_aabb():
    """Marched sample midpoints lie inside the (occupied) grid AABB
    (reference tests/test_ray_marching.py:43-47)."""
    rays_o, rays_d = _rand_rays(seed=1)
    grid = create_grid(roi_aabb=[0.0, 0.0, 0.0, 1.0, 1.0, 1.0], resolution=8,
                       occupied=True)
    scene_aabb = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    ray_indices, t_starts, t_ends, masks = ray_marching(
        rays_o, rays_d, scene_aabb=scene_aabb, grid=grid,
        render_step_size=1e-2, max_samples_per_ray=256,
    )
    m = np.asarray(masks)
    assert m.any()
    t_mid = (np.asarray(t_starts) + np.asarray(t_ends))[:, 0] / 2
    o = np.asarray(rays_o)[np.asarray(ray_indices)]
    d = np.asarray(rays_d)[np.asarray(ray_indices)]
    x = o + t_mid[:, None] * d
    eps = 1e-4
    assert (x[m] >= -eps).all() and (x[m] <= 1 + eps).all()


def test_grid_skipping_reduces_samples():
    rays_o, rays_d = _rand_rays(seed=2)
    scene_aabb = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    grid_full = create_grid([0, 0, 0, 1, 1, 1], resolution=8, occupied=True)
    # only one octant occupied
    binary = np.zeros((8, 8, 8), bool)
    binary[:4, :4, :4] = True
    grid_part = with_binary(grid_full, jnp.array(binary))
    _, _, _, m_full = ray_marching(
        rays_o, rays_d, scene_aabb=scene_aabb, grid=grid_full,
        render_step_size=1e-2, max_samples_per_ray=256)
    _, _, _, m_part = ray_marching(
        rays_o, rays_d, scene_aabb=scene_aabb, grid=grid_part,
        render_step_size=1e-2, max_samples_per_ray=256)
    assert int(m_part.sum()) < int(m_full.sum())


def test_samples_needed_for_range_matches_serial_recurrence():
    """The closed-form config-sizing count equals the reference's serial
    marching loop count (``ray_marching.cu:139-161``: ``t += clamp(t *
    cone, dt, dt_max)`` until ``t >= t_max``) to within one step, across
    phases A/B/C and the degenerate cases."""
    from nerfacc_tpu import samples_needed_for_range

    def serial(t_min, t_max, dt, cone, dt_max=1e10):
        t, n = t_min, 0
        while t < t_max and n < 10**7:
            t += min(max(t * cone, dt), dt_max)
            n += 1
        return n

    cases = [
        (0.2, 1e4, 1e-2, 0.004, 1e10),   # the unbounded-360 config
        (0.2, 1e4, 1e-2, 0.004, 5.0),    # dt_max-capped phase C
        (0.2, 6.0, 1e-2, 0.0, 1e10),     # bounded, no cone
        (0.5, 0.4, 1e-2, 0.004, 1e10),   # empty range
        (2.0, 300.0, 1e-2, 0.05, 1e10),  # t_min already in phase B
        (0.2, 1.0, 1e-2, 0.004, 1e10),   # ends inside phase A
    ]
    for t_min, t_max, dt, cone, dtm in cases:
        got = samples_needed_for_range(t_min, t_max, dt, cone, dtm)
        want = serial(t_min, t_max, dt, cone, dtm)
        assert abs(got - want) <= 1, (t_min, t_max, dt, cone, dtm, got, want)


def test_cone_angle_step_growth():
    """With cone_angle > 0 step sizes grow as clamp(t*cone, dt_min, dt_max)."""
    rays_o = jnp.zeros((1, 3))
    rays_d = jnp.array([[1.0, 0.0, 0.0]])
    ray_indices, t_starts, t_ends, masks = ray_marching(
        rays_o, rays_d, near_plane=0.5, far_plane=100.0,
        render_step_size=1e-2, cone_angle=0.04, max_samples_per_ray=256,
    )
    m = np.asarray(masks)
    ts = np.asarray(t_starts)[:, 0][m]
    te = np.asarray(t_ends)[:, 0][m]
    dt = te - ts
    # reproduce the reference recurrence serially
    t, want = 0.5, []
    while (len(want) < len(dt)):
        step = min(max(t * 0.04, 1e-2), 1e10)
        want.append(step)
        t += step
    np.testing.assert_allclose(dt, np.array(want), rtol=1e-3)
    # boundaries are contiguous
    np.testing.assert_allclose(te[:-1], ts[1:], rtol=1e-4)


def test_stratified_needs_key_and_jitters():
    rays_o, rays_d = _rand_rays(n=4, seed=3)
    try:
        ray_marching(rays_o, rays_d, near_plane=0.1, far_plane=1.0,
                     render_step_size=1e-2, stratified=True)
        assert False, "should require key"
    except ValueError:
        pass
    out1 = ray_marching(rays_o, rays_d, near_plane=0.1, far_plane=1.0,
                        render_step_size=1e-2, stratified=True,
                        key=jax.random.PRNGKey(0), max_samples_per_ray=64)
    out2 = ray_marching(rays_o, rays_d, near_plane=0.1, far_plane=1.0,
                        render_step_size=1e-2, stratified=True,
                        key=jax.random.PRNGKey(1), max_samples_per_ray=64)
    assert not np.allclose(np.asarray(out1.t_starts), np.asarray(out2.t_starts))


def test_sigma_fn_visibility_culling():
    """Opaque wall at t>0.5 -> everything behind it is culled."""
    rays_o, rays_d = _rand_rays(n=8, seed=4)

    def sigma_fn(t_starts, t_ends, ray_indices):
        return jnp.where(t_starts > 0.5, 1e4, 0.0)

    out_nofn = ray_marching(
        rays_o, rays_d, near_plane=0.1, far_plane=2.0,
        render_step_size=1e-2, max_samples_per_ray=256)
    out = ray_marching(
        rays_o, rays_d, near_plane=0.1, far_plane=2.0,
        render_step_size=1e-2, max_samples_per_ray=256,
        sigma_fn=sigma_fn, early_stop_eps=1e-4, alpha_thre=0.0)
    assert int(out.masks.sum()) < int(out_nofn.masks.sum())
    ts = np.asarray(out.t_starts)[:, 0][np.asarray(out.masks)]
    # nothing deep behind the wall survives (a couple of wall samples do)
    assert (ts <= 0.6).all()


def test_visible_samples_budget_recompacts():
    rays_o, rays_d = _rand_rays(n=8, seed=5)

    def sigma_fn(t_starts, t_ends, ray_indices):
        return jnp.where(t_starts > 0.5, 1e4, 0.0)

    out = ray_marching(
        rays_o, rays_d, near_plane=0.1, far_plane=2.0,
        render_step_size=1e-2, max_samples_per_ray=256,
        sigma_fn=sigma_fn, visible_samples_budget=512)
    assert out.t_starts.shape == (512, 1)
    m = np.asarray(out.masks)
    ri = np.asarray(out.ray_indices)[m]
    assert (np.diff(ri) >= 0).all()


def test_chunk_level_march_matches_sample_level():
    """With a uniform grid (dilated == exact) the grouped coarse path
    (coarse_stride > 1) emits exactly the same samples as the exact
    per-sample path — including under decimation (the grouped rank search
    is sample-granular)."""
    from nerfacc_tpu.ray_marching import march_rays
    from nerfacc_tpu.intersection import ray_aabb_intersect

    rays_o, rays_d = _rand_rays(n=16, seed=7)
    grid = create_grid([0, 0, 0, 1, 1, 1], resolution=16, occupied=True)
    aabb = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, aabb)
    for K in (192, 32):
        a = march_rays(rays_o, rays_d, t_min, t_max, grid,
                       render_step_size=1e-2, max_samples_per_ray=256,
                       slots_per_ray=K, coarse_stride=8)
        b = march_rays(rays_o, rays_d, t_min, t_max, grid,
                       render_step_size=1e-2, max_samples_per_ray=256,
                       slots_per_ray=K, coarse_stride=1)
        _assert_same(a, b)


def _assert_same(a, b):
    ma, mb = np.asarray(a.masks), np.asarray(b.masks)
    assert ma.any()
    np.testing.assert_array_equal(ma, mb)
    np.testing.assert_allclose(
        np.asarray(a.t_starts)[ma], np.asarray(b.t_starts)[mb], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.deltas)[ma], np.asarray(b.deltas)[mb], rtol=1e-5
    )


def test_lattice_k_inverts_lattice_t():
    from nerfacc_tpu.ray_marching import _lattice_k, _lattice_t

    t_min = jnp.asarray([0.3, 1.0, 2.5])
    k = jnp.asarray([[0.0, 3.7, 45.2, 300.0]] * 3)
    for cone in (0.0, 0.04):
        t = _lattice_t(t_min[:, None], k, 1e-2, cone, dt_max=5.0)
        k_back = _lattice_k(t_min[:, None], t, 1e-2, cone, dt_max=5.0)
        np.testing.assert_allclose(np.asarray(k_back), np.asarray(k),
                                   rtol=1e-4, atol=1e-3)


def test_cone_march_with_grid_grouped():
    """Cone-angle marching through the grouped coarse path matches the
    exact per-sample path (uniform grid; in-range prefix counts come from
    the lattice inverse)."""
    from nerfacc_tpu.ray_marching import march_rays

    rays_o = jnp.zeros((4, 3)).at[:, 0].set(jnp.arange(4) * 0.1)
    rays_d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1))
    grid = create_grid([0, 0, 0, 60, 1, 1], resolution=(64, 8, 8),
                       occupied=True)
    t_min = jnp.full((4,), 0.5)
    t_max = jnp.full((4,), 50.0)
    a = march_rays(rays_o + jnp.asarray([0.0, 0.5, 0.5]), rays_d,
                   t_min, t_max, grid, render_step_size=1e-2,
                   cone_angle=0.04, max_samples_per_ray=256,
                   slots_per_ray=64, coarse_stride=8, dt_max=2.0,
                   probe_dilation=2)
    b = march_rays(rays_o + jnp.asarray([0.0, 0.5, 0.5]), rays_d,
                   t_min, t_max, grid, render_step_size=1e-2,
                   cone_angle=0.04, max_samples_per_ray=256,
                   slots_per_ray=64, coarse_stride=1, dt_max=2.0)
    ma, mb = np.asarray(a.masks), np.asarray(b.masks)
    assert ma.any()
    np.testing.assert_array_equal(ma, mb)
    np.testing.assert_allclose(
        np.asarray(a.t_starts)[ma], np.asarray(b.t_starts)[mb], rtol=1e-4
    )


def test_probe_dilation_tables():
    """Radius-2 probes see occupancy within 2 voxels; radius-1 within 1."""
    binary = np.zeros((16, 16, 16), bool)
    binary[8, 8, 8] = True
    grid = with_binary(create_grid([0, 0, 0, 1, 1, 1], resolution=16),
                       jnp.asarray(binary))
    # centers of cells at various distances from (8,8,8)
    def center(i):
        return jnp.asarray([[(i + 0.5) / 16, 8.5 / 16, 8.5 / 16]])
    for d, want1, want2 in [(8, True, True), (7, True, True),
                            (6, False, True), (5, False, False)]:
        v1 = bool(grid.query_occ_fast(center(d), dilated=1)[0])
        v2 = bool(grid.query_occ_fast(center(d), dilated=2)[0])
        assert v1 == want1 and v2 == want2, (d, v1, v2)


def test_adaptive_probe_groups_matches_exact():
    """Adaptive-stride probing (fixed group count, per-ray stride sized to
    the in-range span) emits the same samples as the exact per-sample path
    when coverage suffices — fewer probes, identical sample sets."""
    from nerfacc_tpu.intersection import ray_aabb_intersect
    from nerfacc_tpu.ray_marching import march_rays

    rays_o, rays_d = _rand_rays(n=16, seed=11)
    grid = create_grid([0, 0, 0, 1, 1, 1], resolution=16, occupied=True)
    aabb = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, aabb)
    for K in (192, 32):
        # G * C = 32 * 8 = 256 = S: full coverage even for the longest ray
        a = march_rays(rays_o, rays_d, t_min, t_max, grid,
                       render_step_size=1e-2, max_samples_per_ray=256,
                       slots_per_ray=K, coarse_stride=8, probe_groups=32)
        b = march_rays(rays_o, rays_d, t_min, t_max, grid,
                       render_step_size=1e-2, max_samples_per_ray=256,
                       slots_per_ray=K, coarse_stride=1)
        _assert_same(a, b)


def test_adaptive_probe_groups_partial_occupancy():
    """Adaptive probing against a half-occupied grid matches the exact
    path (the occupied half is axis-aligned, so the radius-1 dilated probe
    plus the exact re-check reproduce exact sample sets)."""
    from nerfacc_tpu.intersection import ray_aabb_intersect
    from nerfacc_tpu.ray_marching import march_rays

    rays_o, rays_d = _rand_rays(n=24, seed=13)
    binary = np.zeros((16, 16, 16), bool)
    binary[4:12, 4:12, 4:12] = True
    grid = create_grid([0, 0, 0, 1, 1, 1], resolution=16)
    grid = with_binary(grid, jnp.asarray(binary))
    aabb = jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    t_min, t_max = ray_aabb_intersect(rays_o, rays_d, aabb)
    # stride cap 2: 2 * step / 2 = 1e-2 <= 1 voxel (1/16) -> radius-1 valid
    a = march_rays(rays_o, rays_d, t_min, t_max, grid,
                   render_step_size=1e-2, max_samples_per_ray=256,
                   slots_per_ray=128, coarse_stride=2, probe_groups=128,
                   probe_dilation=1)
    b = march_rays(rays_o, rays_d, t_min, t_max, grid,
                   render_step_size=1e-2, max_samples_per_ray=256,
                   slots_per_ray=128, coarse_stride=1)
    # dilation positives occupy slots (masked by the exact re-check), so
    # slot *positions* differ from the exact path; the per-ray live sample
    # sets must match exactly (K is large enough that nothing decimates)
    ma, mb = np.asarray(a.masks), np.asarray(b.masks)
    assert ma.any()
    np.testing.assert_array_equal(ma.sum(1), mb.sum(1))
    ta, tb = np.asarray(a.t_starts), np.asarray(b.t_starts)
    for r in range(ta.shape[0]):
        np.testing.assert_allclose(
            np.sort(ta[r][ma[r]]), np.sort(tb[r][mb[r]]), rtol=1e-5
        )


def test_cone_decimation_exact_group_width():
    """With cone_angle > 0 a decimation s-group's later intervals are
    geometrically larger, so widening by (first interval * scale) would
    under-cover the group (advisor round-1 finding). Deltas must equal
    the exact closed-form group span t(pos+scale) - t(pos), and live
    deltas must tile the in-range span exactly."""
    from nerfacc_tpu.ray_marching import _lattice_k, _lattice_t, march_rays

    n = 4
    rays_o = jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.5, 0.5])
    rays_d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    t_min = jnp.full((n,), 0.5)
    t_max = jnp.full((n,), 40.0)
    step, cone, dtm = 1e-2, 0.05, 1e10
    K = 16  # far fewer slots than in-range candidates -> decimation
    segs = march_rays(
        rays_o, rays_d, t_min, t_max, grid=None,
        render_step_size=step, cone_angle=cone,
        max_samples_per_ray=512, slots_per_ray=K, dt_max=dtm,
    )
    masks = np.asarray(segs.masks)
    deltas = np.asarray(segs.deltas)
    k_in = np.ceil(
        np.asarray(_lattice_k(t_min, t_max, step, cone, dtm)) - 0.5
    ).astype(int)
    count = int(k_in[0])
    assert count > K  # decimation really kicks in
    # live slots: ceil(count / stride) with stride = ceil(count / K);
    # trailing slots past the last group are dead by design
    stride = -(-count // K)
    n_live = -(-count // stride)
    assert masks[:, :n_live].all()
    assert not masks[:, n_live:].any()
    # live deltas tile [t(0), t(k_in)) exactly: consecutive group starts
    t0 = np.asarray(_lattice_t(t_min, jnp.zeros(n), step, cone, dtm))
    starts = np.asarray(segs.t_starts)
    ends = starts + deltas
    np.testing.assert_allclose(starts[:, 0], t0, rtol=1e-5)
    np.testing.assert_allclose(
        starts[:, 1:n_live], ends[:, : n_live - 1], rtol=1e-4
    )
    t_end_span = np.asarray(
        _lattice_t(t_min, jnp.asarray(k_in, jnp.float32), step, cone, dtm)
    )
    np.testing.assert_allclose(ends[:, n_live - 1], t_end_span, rtol=1e-4)
    # the exact widths strictly exceed the naive first-interval * scale
    # widening wherever the group holds more than one geometric interval
    naive = (np.asarray(segs.t_ends) - starts) * stride
    grow = deltas[:, : n_live - 1] > naive[:, : n_live - 1] * (1 + 1e-6)
    assert grow.any()


def test_ray_marching_fast_path_knobs():
    """The parity API exposes the fast-path knobs (probe_dilation,
    probe_groups, exact_recheck): with them on, the emitted live samples
    match the slow exact path."""
    rays_o, rays_d = _rand_rays(n=16, seed=13)
    rays_o = rays_o * 0.2 + 0.4
    grid = create_grid([0, 0, 0, 1, 1, 1], resolution=16, occupied=True)
    # samples_budget = n_rays * S so K == S: no decimation — under
    # decimation the grouped fast path legitimately picks different
    # representatives than the flat path, so exact equality is only the
    # contract at full slot capacity
    common = dict(
        near_plane=0.05, far_plane=1.5, render_step_size=1e-2,
        max_samples_per_ray=256, samples_budget=16 * 256,
    )
    slow = ray_marching(rays_o, rays_d, grid=grid, **common)
    # probe_groups * coarse_stride must cover max_samples_per_ray, else
    # long rays get their candidate tail truncated (documented adaptive-
    # stride behavior) and exactness is off the table
    fast = ray_marching(
        rays_o, rays_d, grid=grid, coarse_stride=8, probe_dilation=2,
        probe_groups=32, exact_recheck=True, **common,
    )
    ms, mf = np.asarray(slow.masks), np.asarray(fast.masks)
    assert ms.any()
    np.testing.assert_array_equal(ms, mf)
    np.testing.assert_allclose(
        np.asarray(slow.t_starts)[ms], np.asarray(fast.t_starts)[mf],
        rtol=1e-5,
    )


def test_lattice_starvation_guard_warns_once():
    """Library-level guard (round-4 VERDICT #7): a max_samples_per_ray
    that cannot cover 90% of the static [near, far] range must raise a
    RuntimeWarning at the library entry points (the reference's marcher
    has no cap — ray_marching.cu:139-161 — so our cap must self-police),
    exactly once per config; a covering config must stay silent."""
    import warnings as _w

    from nerfacc_tpu.ray_marching import _starvation_warned

    rng = np.random.RandomState(0)
    o = jnp.asarray(rng.rand(4, 3), jnp.float32)
    d = jnp.asarray(rng.randn(4, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    _starvation_warned.clear()
    starved = dict(
        near_plane=0.2, far_plane=1e4, render_step_size=1e-2,
        cone_angle=0.004, max_samples_per_ray=512,
        samples_budget=4 * 64,
    )
    with pytest.warns(RuntimeWarning, match="max_samples_per_ray"):
        ray_marching(o, d, **starved)
    # warn-once: a second identical call stays silent
    with _w.catch_warnings():
        _w.simplefilter("error")
        ray_marching(o, d, **starved)

    # a covering config is silent (needs ~2308 < 4096)
    with _w.catch_warnings():
        _w.simplefilter("error")
        ray_marching(
            o, d, near_plane=0.2, far_plane=1e4, render_step_size=1e-2,
            cone_angle=0.004, max_samples_per_ray=4096,
            samples_budget=4 * 64,
        )

    # render_rays (the hot-path entry) warns too
    from nerfacc_tpu.utils import render_rays
    from nerfacc_tpu.models import VanillaNeRFRadianceField

    field = VanillaNeRFRadianceField(net_depth=1, net_width=16)
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3))
    )
    _starvation_warned.clear()
    with pytest.warns(RuntimeWarning, match="max_samples_per_ray"):
        render_rays(
            params, field, o, d, near_plane=0.2, far_plane=1e4,
            render_step_size=1e-2, cone_angle=0.004,
            max_samples_per_ray=512, samples_budget=4 * 64,
        )
    _starvation_warned.clear()
