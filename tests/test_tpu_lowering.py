"""TPU (Mosaic) lowering checks for every Pallas kernel — no chip needed.

``jax.export.export(jax.jit(f), platforms=['tpu'])`` runs the full
client-side Pallas -> Mosaic lowering + serialization on a CPU-only
process. That catches unsupported-op / layout lowering errors — the bulk
of the "first time on hardware" risk for kernels developed against
interpret mode — before the driver's round-end compile check meets the
real chip. (Device-side Mosaic layout verification is the residual risk;
``bench.py`` carries a runtime fallback for that.)

The kernels' ``interpret`` gates key on ``jax.default_backend()`` which
is ``cpu`` here, so each check forces ``interpret=False`` explicitly or
via the module's ``_use_interpret`` hook.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from nerfacc_tpu.ops import cp_encoder, hash_gather, march_select


def _export_tpu(fn, *args):
    exported = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert exported.mlir_module_serialized  # non-empty artifact
    return exported


def test_march_select_lowers_for_tpu():
    R, G, K = 2048, 32, 64
    live = jnp.zeros((R, G), jnp.int32)
    gsize = jnp.ones((R, 1), jnp.int32)
    t_min = jnp.zeros((R,), jnp.float32)
    fn = functools.partial(
        march_select.fused_select_grouped,
        k_slots=K, step_size=5e-3, cone_angle=0.004, dt_max=0.1,
        interpret=False,
    )
    _export_tpu(fn, live, gsize, t_min)


def test_reselect_lowers_for_tpu():
    R, K, K2 = 2048, 64, 32
    masks = jnp.zeros((R, K), jnp.float32)
    ts = jnp.zeros((R, K), jnp.float32)
    fn = functools.partial(march_select.fused_reselect, k2=K2,
                           interpret=False)
    _export_tpu(fn, masks, ts, ts, ts)


def test_hash_grad_scatter_lowers_for_tpu(monkeypatch):
    monkeypatch.setattr(hash_gather, "_use_interpret", lambda: False)
    B, T = 8192, 1 << 15
    idx = jnp.zeros((B,), jnp.int32)
    vals = jnp.zeros((B, 2), jnp.float32)
    fn = functools.partial(hash_gather.hash_grad_scatter, n_entries=T)
    _export_tpu(fn, idx, vals)


def test_cp_encoder_lowers_for_tpu(monkeypatch):
    monkeypatch.setattr(cp_encoder, "_use_interpret", lambda: False,
                        raising=False)
    B, G, Rk = 4096, 64, 32
    xu = jnp.zeros((B, 3), jnp.float32)
    ts = [jnp.zeros((G, Rk), jnp.float32) for _ in range(3)]

    def fwd_bwd(xu, t0, t1, t2):
        def loss(t0, t1, t2):
            return jnp.sum(cp_encoder.cp_level_features(xu, t0, t1, t2))

        return jax.grad(loss, argnums=(0, 1, 2))(*ts)

    _export_tpu(fwd_bwd, xu, *ts)


def test_flagship_render_path_lowers_for_tpu():
    """The driver's single-chip compile check (__graft_entry__.entry) with
    the fused Pallas march kernels forced ON (opt-in path; the XLA
    op-chain is the default) — validates the kernels still lower for TPU."""
    import __graft_entry__ as ge
    from nerfacc_tpu.utils import render_rays

    field, params, grid, rays_o, rays_d, kwargs = ge._build()
    kwargs = dict(kwargs, use_pallas=True)

    # interpret=None inside the kernels would re-key on the cpu backend;
    # force the Mosaic path for the export trace
    for mod in (march_select,):
        orig = mod._use_interpret
        mod._use_interpret = lambda: False
    try:
        def fn(params, grid, rays_o, rays_d):
            colors, opacities, depths, n = render_rays(
                params, field, rays_o, rays_d, grid=grid,
                render_bkgd=jnp.ones(3), **kwargs,
            )
            return colors, opacities, depths

        _export_tpu(fn, params, grid, rays_o, rays_d)
    finally:
        march_select._use_interpret = orig
