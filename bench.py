"""Benchmark: end-to-end train-step throughput on the real chip.

Measures samples/s through the full differentiable render path (occupancy
grid march -> sigma-culling -> grad-tracked composite -> backward + adam),
the workload the reference's headline "NGP Lego 20k steps / 287 s" number
is made of. Baseline: the reference targets 2^18 samples/batch over 20k
steps in 287 s on a TITAN RTX => ~1.83e7 samples/s; ``vs_baseline`` is our
measured samples/s over that.

All data stays device-resident during the timing loop (the tunnel between
this host and the chip makes per-step host round-trips cost ~ms each);
the live-sample counter is accumulated on device and read once.

Prints ONE JSON line.
"""

from __future__ import annotations

import os

# persistent XLA compilation cache: repeated runs skip the (slow) compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import functools
import json
import time
from pathlib import Path

import jax

if os.environ.get("NERFACC_PLATFORM"):
    # hermetic hook: force a platform (e.g. cpu) before first use. The
    # axon sitecustomize imports jax at interpreter start and snapshots
    # JAX_PLATFORMS, so a plain env var is too late here. Without this,
    # a "CPU" bench run silently grabs the TPU tunnel and BLOCKS any
    # concurrent driver job in backend init (measured round-5: two
    # wedged bench jobs diagnosed as hangs were exactly this).
    jax.config.update("jax_platforms", os.environ["NERFACC_PLATFORM"])
import jax.numpy as jnp
import numpy as np
import optax

REFERENCE_SAMPLES_PER_S = (1 << 18) * 20_000 / 287.0  # ~1.83e7


def main():
    from nerfacc_tpu import create_grid, with_binary
    from nerfacc_tpu.models import NGPRadianceField, TensoCPRadianceField
    from nerfacc_tpu.utils import render_rays

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model", choices=["tensorf", "ngp"], default="tensorf",
        help="'tensorf' (CP hat-basis matmuls, the TPU-native NGP-class "
        "flagship) or 'ngp' (hash-grid gather path, measured for the "
        "parity write-up — HBM random-row gathers bound it; see "
        "docs/benchmarks.md)",
    )
    ap.add_argument(
        "--grid", choices=["halfcube", "trained"], default="halfcube",
        help="occupancy: synthetic half-occupied cube, or the binary "
        "saved from a trained procedural run (bench_assets/"
        "trained_grid.npz) so culling ratios match a real scene",
    )
    ap.add_argument("--iters", type=int, default=0, help="0 = per-model default")
    ap.add_argument("--n_rays", type=int, default=16384)
    ap.add_argument(
        "--fused_march", action="store_true",
        help="enable the fused Pallas march-select kernel. Default is the "
        "XLA op-chain selection: measured ~2%% faster end-to-end on v5e "
        "(21.87M vs 21.49M samples/s) because XLA cannot fuse across the "
        "Pallas custom call — see docs/benchmarks.md",
    )
    ap.add_argument(
        "--no_fused_march", action="store_true",
        help="(deprecated; the XLA path is now the default) force the "
        "XLA op-chain selection",
    )
    ap.add_argument(
        "--quant_int8", action="store_true",
        help="with --model tensorf: run the CP forward contractions on "
        "the int8 MXU (2x the bf16 rate; basis quantization = 1/127-voxel "
        "positional rounding, exact bf16 backward)",
    )
    ap.add_argument(
        "--visible_budget_ratio", type=float, default=0.0,
        help="> 0 enables the two-stage cull-then-render path (the "
        "flagship quality config uses 0.5): stage-1 density-only pass + "
        "visibility culling, then the grad-tracked render on "
        "ratio * samples_budget re-selected visible slots",
    )
    ap.add_argument(
        "--field_budget_ratio", type=float, default=-1.0,
        help="compact the radiance-field evaluation to ratio * "
        "samples_budget march-live slots (ops/sample_compact.py). "
        "Gather-bound encoders pay ~1.1 ns per gathered element per "
        "slot, live or dead; at the bench's ~40%% slot occupancy "
        "compaction is a direct win for --model ngp. MXU-cheap fields "
        "lose (glue > dead-lane FLOPs). Default -1 = auto: 0.5 for ngp, "
        "off for tensorf",
    )
    ap.add_argument(
        "--mode", choices=["train", "eval"], default="train",
        help="train: full differentiable step (the headline metric); "
        "eval: forward-only render (inference rays/s + samples/s)",
    )
    ap.add_argument(
        "--trace", type=str, default=None, metavar="DIR",
        help="capture a jax.profiler trace of the timed loop into DIR "
        "(parse with scripts/xplane.py for the per-op step anatomy)",
    )
    ap.add_argument(
        "--ngp_gather_mode", type=str, default="packed",
        choices=["packed", "per_level"],
        help="with --model ngp: forward gather formulation (per_level = "
        "round-5 experiment, L gathers over 2MB per-level operands)",
    )
    ap.add_argument(
        "--ngp_log2_size", type=int, default=19,
        help="with --model ngp: log2 hash-table size per level (the L/T "
        "quality-throughput frontier; reference uses 19)",
    )
    ap.add_argument(
        "--ngp_levels", type=int, default=16,
        help="with --model ngp: number of hash levels (reference: 16)",
    )
    ap.add_argument(
        "--ngp_features", type=int, default=2,
        help="with --model ngp: features per level (4 + 8 levels = the "
        "capacity-preserving half-sort-volume config)",
    )
    ap.add_argument(
        "--ngp_pallas_grad", action="store_true",
        help="with --model ngp: use the round-2 serial Pallas VMEM "
        "scatter for the hash-table gradient instead of XLA's fused "
        "sort-scatter (measured ~1000x slower; the before/after "
        "comparison in docs/benchmarks.md)",
    )
    args = ap.parse_args()

    n_rays = args.n_rays
    samples_budget = n_rays * 48  # K=48 slots/ray pre-compaction
    aabb = jnp.asarray([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])

    # flagship NGP-class field (the reference's headline workload is the
    # NGP hash-grid example; TensoCP is its TPU-native equivalent)
    if args.model == "tensorf":
        field = TensoCPRadianceField(
            aabb=tuple(float(v) for v in np.asarray(aabb)),
            quant_int8=args.quant_int8,
        )
        iters = args.iters or 30
    else:
        field = NGPRadianceField(
            aabb=tuple(float(v) for v in np.asarray(aabb)),
            pallas_grad=args.ngp_pallas_grad,
            gather_mode=args.ngp_gather_mode,
            log2_hashmap_size=args.ngp_log2_size,
            n_levels=args.ngp_levels,
            n_features=args.ngp_features,
        )
        iters = args.iters or (3 if args.ngp_pallas_grad else 20)
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )
    grid = create_grid(aabb, resolution=128, occupied=True)
    if args.grid == "trained":
        # occupancy binary from a converged procedural training run
        # (scripts/save_bench_grid.py) — realistic sparsity + topology
        asset = Path(__file__).parent / "bench_assets" / "trained_grid.npz"
        if not asset.exists():
            raise SystemExit(
                f"{asset} missing — generate it first: "
                "python scripts/save_bench_grid.py --steps 2000"
            )
        binary = np.load(asset)["binary"]
    else:
        # half-occupied cube: synthetic but stable culling ratio
        binary = np.zeros((128, 128, 128), bool)
        binary[32:96, 32:96, 32:96] = True
    grid = with_binary(grid, jnp.asarray(binary))

    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    kwargs = dict(
        scene_aabb=aabb,
        render_step_size=5e-3,
        max_samples_per_ray=1024,
        samples_budget=samples_budget,
        coarse_stride=16,
        probe_dilation=2,  # C*dt/2 = 0.04 <= 2 voxels (0.047)
        # ~60% of rays hit the half-occupied cube; drop the rest before any
        # per-sample work and re-spread the budget over hitting rays
        compact_rays_fraction=0.75,
        # adaptive-stride probing: 32 groups/ray sized to each ray's
        # in-range span (vs 64 fixed-stride groups, most of them beyond
        # t_max) — fewer lookups and finer probes on short rays
        probe_groups=32,
        use_pallas=True if args.fused_march and not args.no_fused_march
        else None,
    )
    if args.visible_budget_ratio > 0:
        kwargs["visible_samples_budget"] = int(
            samples_budget * args.visible_budget_ratio
        )
    field_ratio = args.field_budget_ratio
    if field_ratio < 0:
        field_ratio = 0.5 if args.model == "ngp" else 0.0
    if field_ratio > 0:
        kwargs["field_samples_budget"] = int(samples_budget * field_ratio)

    if args.mode == "eval":
        # inference path: forward-only render (no grad, no optimizer).
        # Same Pallas->XLA fallback as the train path below.
        def make_eval_step(kwargs):
            @functools.partial(jax.jit, donate_argnums=(2,))
            def eval_step(params, grid, n_acc, rays_o, rays_d):
                colors, _, _, n = render_rays(
                    params, field, rays_o, rays_d, grid=grid,
                    render_bkgd=jnp.ones(3), **kwargs,
                )
                return n_acc + n, colors

            return eval_step

        eval_step = make_eval_step(kwargs)
        r = np.random.RandomState(0)
        o = jnp.asarray(r.rand(iters + 1, n_rays, 3) * 2 - 1, jnp.float32)
        d = jnp.asarray(r.randn(iters + 1, n_rays, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        n_acc = jnp.zeros((), jnp.int32)
        try:
            n_acc, colors = eval_step(params, grid, n_acc, o[0], d[0])
            np.asarray(colors[:1])  # true sync (host read)
        except Exception as e:  # noqa: BLE001
            if kwargs.get("use_pallas") is not True:
                raise
            import sys

            print(f"fused-march path failed ({type(e).__name__}); "
                  "retrying with use_pallas=False", file=sys.stderr)
            eval_step = make_eval_step(dict(kwargs, use_pallas=False))
            n_acc = jnp.zeros((), jnp.int32)
            n_acc, colors = eval_step(params, grid, n_acc, o[0], d[0])
            np.asarray(colors[:1])
        n_acc = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        for i in range(1, iters + 1):
            n_acc, colors = eval_step(params, grid, n_acc, o[i], d[i])
        n_total = int(np.asarray(n_acc))
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "eval_samples_per_s_per_chip",
                    "value": round(n_total / dt, 1),
                    "unit": "samples/s",
                    "vs_baseline": round(
                        n_total / dt / REFERENCE_SAMPLES_PER_S, 3
                    ),
                    "rays_per_s": round(iters * n_rays / dt, 1),
                    "model": args.model,
                    "grid": args.grid,
                }
            )
        )
        return

    # donating params/opt_state/n_acc lets XLA update them in place
    # (saves ~0.7 ms/step of whole-pytree copies). Built by a factory so
    # the fallback below gets a fresh function object — jax caches the
    # traced jaxpr per function object, and the failed trace contains
    # the pallas_call.
    def make_train_step(kwargs):
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, n_acc, rays_o, rays_d, pixels):
            def loss_fn(p):
                # compact path: non-hit rays render exactly the
                # background, so the full-batch MSE is recovered
                # algebraically without the expand-back scatter (see
                # render_rays(return_compact=True))
                colors, _, _, n, sel = render_rays(
                    p, field, rays_o, rays_d, grid=grid,
                    render_bkgd=jnp.ones(3), aux=pixels,
                    return_compact=True, **kwargs,
                )
                p_h, okm = sel["aux"], sel["ray_ok"][:, None]
                sh = jnp.sum(jnp.where(okm, (colors - p_h) ** 2, 0.0))
                sbg = jnp.sum((1.0 - pixels) ** 2) - jnp.sum(
                    jnp.where(okm, (1.0 - p_h) ** 2, 0.0)
                )
                return (sh + sbg) / pixels.size, n

            (loss, n), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, n_acc + n, loss

        return train_step

    train_step = make_train_step(kwargs)

    r = np.random.RandomState(0)
    o = jnp.asarray(r.rand(iters + 1, n_rays, 3) * 2 - 1, jnp.float32)
    d = jnp.asarray(r.randn(iters + 1, n_rays, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    px = jnp.asarray(r.rand(iters + 1, n_rays, 3), jnp.float32)
    n_acc = jnp.zeros((), jnp.int32)

    # warmup (compile) + true sync via host read. Safety net: if the
    # fused Pallas march kernels fail device-side (Mosaic layout
    # verification is the one risk jax.export lowering checks can't
    # cover — tests/test_tpu_lowering.py), fall back to the XLA
    # selection path rather than failing the whole benchmark.
    try:
        params, opt_state, n_acc, loss = train_step(
            params, opt_state, n_acc, o[0], d[0], px[0]
        )
        np.asarray(loss)
    except Exception as e:  # noqa: BLE001 - any compile/runtime failure
        if kwargs.get("use_pallas") is not True:
            raise
        import sys

        print(f"fused-march path failed ({type(e).__name__}); "
              "retrying with use_pallas=False", file=sys.stderr)
        kwargs = dict(kwargs, use_pallas=False)
        train_step = make_train_step(kwargs)
        params = field.init(
            jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
        )
        opt_state = optimizer.init(params)
        n_acc = jnp.zeros((), jnp.int32)
        params, opt_state, n_acc, loss = train_step(
            params, opt_state, n_acc, o[0], d[0], px[0]
        )
        np.asarray(loss)
    n_acc = jnp.zeros((), jnp.int32)

    import contextlib

    trace_cm = (
        jax.profiler.trace(args.trace)
        if args.trace
        else contextlib.nullcontext()
    )
    t0 = time.perf_counter()
    with trace_cm:
        for i in range(1, iters + 1):
            params, opt_state, n_acc, loss = train_step(
                params, opt_state, n_acc, o[i], d[i], px[i]
            )
        n_total = int(np.asarray(n_acc))  # device->host read: real sync
    dt = time.perf_counter() - t0

    samples_per_s = n_total / dt
    print(
        json.dumps(
            {
                "metric": "train_samples_per_s_per_chip",
                "value": round(samples_per_s, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_s / REFERENCE_SAMPLES_PER_S, 3),
                "model": args.model,
                "grid": args.grid,
                "quant_int8": args.quant_int8,
                "visible_budget_ratio": args.visible_budget_ratio,
                "field_budget_ratio": field_ratio,
                # the kwargs actually used by the final train_step (the
                # warmup may have fallen back to use_pallas=False above)
                "fused_march": bool(kwargs.get("use_pallas")),
            }
        )
    )


if __name__ == "__main__":
    main()
