"""Round-3 bisect: the ngp bench step is 6.8 s but field-only costs 1.4 s.

Times, on chip, each composition layer of the bench's exact train_step:
  A. scatter-add scaling: 100.7M corners -> (8.4M,) x2 shared-idx
  B. encoder grad WITHOUT adam (isolate the optimizer)
  C. bench train_step verbatim (1-iter loop)
  D. bench train_step with prefilter_sigma=False (remove the cull pass)
  E. bench train_step forward-only (no grad)
"""

import functools
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
    from nerfacc_tpu.utils import render_rays

    rng = np.random.RandomState(0)

    # --- A: scatter scaling at bench corner count
    B = 786432 * 128  # 100.7M
    LT = 16 << 19
    idx = jnp.asarray(rng.randint(0, LT, B), jnp.int32)
    v0 = jnp.asarray(rng.rand(B), jnp.float32)
    v1 = jnp.asarray(rng.rand(B), jnp.float32)

    def scatter2(idx, v0, v1):
        return (
            jnp.zeros((LT,), jnp.float32).at[idx].add(v0),
            jnp.zeros((LT,), jnp.float32).at[idx].add(v1),
        )

    timeit("A scatter-add x2 shared idx @100.7M", scatter2, idx, v0, v1)

    def scatter1(idx, v0):
        return jnp.zeros((LT,), jnp.float32).at[idx].add(v0)

    timeit("A scatter-add x1 @100.7M", scatter1, idx, v0)
    del idx, v0, v1

    # --- B: encoder grad without adam
    from nerfacc_tpu.models.hash_encoding import HashEncoder

    N = 786432
    x = jnp.asarray(rng.rand(N, 3), jnp.float32)
    enc = HashEncoder()
    ep = enc.init(jax.random.PRNGKey(0), x[:8])

    def enc_grad(p, xx):
        return jax.grad(lambda pp: jnp.sum(enc.apply(pp, xx) ** 2))(p)

    timeit("B encoder fwd+bwd (no adam)", enc_grad, ep, x)

    # --- C/D/E: the bench's exact train_step
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

    def make_step(kwargs):
        def train_step(params, opt_state, rays_o, rays_d, pixels):
            def loss_fn(p):
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
            updates, new_opt = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, n, loss

        return train_step

    timeit("C bench train_step (verbatim)", make_step(base_kwargs),
           params, opt_state, o, d, px)
    timeit("D train_step prefilter_sigma=False",
           make_step(dict(base_kwargs, prefilter_sigma=False)),
           params, opt_state, o, d, px)

    def fwd_only(params, rays_o, rays_d):
        colors, _, _, n = render_rays(
            params, field, rays_o, rays_d, grid=grid,
            render_bkgd=jnp.ones(3), **base_kwargs,
        )
        return colors, n

    timeit("E render fwd only (bench shapes)", fwd_only, params, o, d)


if __name__ == "__main__":
    main()
