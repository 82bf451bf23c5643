"""Round-3 bisect, take 2: where do the NGP bench step's seconds go?

bisect_ngp3's first microbench (ONE flat 100.7M->8.4M scatter-add) blew
past a 10-minute timeout on-chip — the giant single-sort formulation is
pathological, which is itself a data point (the per-level path the real
backward uses measured 688 ms). This version skips it and times only the
compositions that matter, fastest first so partial output still answers
the question:

  E. render fwd only (bench shapes)     — no scatter anywhere
  B. encoder fwd+grad (no adam, no march)
  F. encoder fwd+grad, UNPACKED gathers  (packed_gather=False A/B)
  C. bench train_step verbatim

Gap analysis: tensorf with the same march/render/adam runs 0.75 ms/step;
(C - B) - 0.75ms is the unexplained composition overhead, (B - scatter
- gathers) the index-math overhead.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

REPS = 2


def timeit(name, fn, *args):
    @jax.jit
    def run(args):
        def body(c, _):
            a = jax.lax.optimization_barrier(args)
            out = fn(*a)
            tot = sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(out)
            )
            return c + tot, None

        c, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=REPS
        )
        return c

    np.asarray(run(args))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(run(args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:44s} {best * 1e3:9.1f} ms", flush=True)
    return best


def main():
    from nerfacc_tpu import create_grid, with_binary
    from nerfacc_tpu.models import NGPRadianceField
    from nerfacc_tpu.models.hash_encoding import HashEncoder
    from nerfacc_tpu.utils import render_rays

    rng = np.random.RandomState(0)
    n_rays = 16384
    samples_budget = n_rays * 48
    aabb = jnp.asarray([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5])
    field = NGPRadianceField(aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5))
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )
    grid = create_grid(aabb, resolution=128, occupied=True)
    binary = np.zeros((128, 128, 128), bool)
    binary[32:96, 32:96, 32:96] = True
    grid = with_binary(grid, jnp.asarray(binary))
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)

    base_kwargs = dict(
        scene_aabb=aabb, render_step_size=5e-3, max_samples_per_ray=1024,
        samples_budget=samples_budget, coarse_stride=16, probe_dilation=2,
        compact_rays_fraction=0.75, probe_groups=32,
    )
    o = jnp.asarray(rng.rand(n_rays, 3) * 2 - 1, jnp.float32)
    d = jnp.asarray(rng.randn(n_rays, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    px = jnp.asarray(rng.rand(n_rays, 3), jnp.float32)

    # --- E: forward only (no scatter)
    def fwd_only(params, rays_o, rays_d):
        colors, _, _, n = render_rays(
            params, field, rays_o, rays_d, grid=grid,
            render_bkgd=jnp.ones(3), **base_kwargs,
        )
        return colors, n

    timeit("E render fwd only (bench shapes)", fwd_only, params, o, d)

    # --- B: encoder grad at bench sample count
    N = 786432
    x = jnp.asarray(rng.rand(N, 3), jnp.float32)
    enc = HashEncoder()
    ep = enc.init(jax.random.PRNGKey(0), x[:8])

    def enc_grad(p, xx):
        return jax.grad(lambda pp: jnp.sum(enc.apply(pp, xx) ** 2))(p)

    timeit("B encoder fwd+bwd (no adam)", enc_grad, ep, x)

    def enc_fwd(p, xx):
        return enc.apply(p, xx)

    timeit("B2 encoder fwd only", enc_fwd, ep, x)

    # --- C: the bench's exact train_step
    def train_step(params, opt_state, rays_o, rays_d, pixels):
        def loss_fn(p):
            colors, _, _, n, sel = render_rays(
                p, field, rays_o, rays_d, grid=grid,
                render_bkgd=jnp.ones(3), aux=pixels,
                return_compact=True, **base_kwargs,
            )
            p_h, okm = sel["aux"], sel["ray_ok"][:, None]
            sh = jnp.sum(jnp.where(okm, (colors - p_h) ** 2, 0.0))
            sbg = jnp.sum((1.0 - pixels) ** 2) - jnp.sum(
                jnp.where(okm, (1.0 - p_h) ** 2, 0.0)
            )
            return (sh + sbg) / pixels.size, n

        (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, n, loss

    timeit("C bench train_step (verbatim)", train_step,
           params, opt_state, o, d, px)


if __name__ == "__main__":
    main()
