"""Bisect the NGP bench step: where do 5 s/step go at N=786k?

Components timed independently on-chip, bench shapes (16384 rays, K=48,
N = 786432 samples):
  A. encoder-only fwd+grad with model-computed indices (not random)
  B. full NGP field (encoder + MLPs + SH) fwd+grad on (N, 3) positions
  C. the march (sampling) alone, no field
  D. the full train step (reference point = bench.py)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N_RAYS = 16384
K = 48
N = N_RAYS * K  # 786432


def timeit(fn, *args, reps=5):
    @jax.jit
    def run(args):
        def body(c, _):
            a = jax.lax.optimization_barrier(args)
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.ravel()[0].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)
        return c

    np.asarray(run(args))
    t0 = time.perf_counter()
    np.asarray(run(args))
    return (time.perf_counter() - t0) / reps * 1e3


def report(name, ms):
    print(f"{name:56s} {ms:9.1f} ms", flush=True)


from nerfacc_tpu.models import NGPRadianceField
from nerfacc_tpu.models.hash_encoding import HashEncoder

key = jax.random.PRNGKey(0)
aabb = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)

x = jax.random.uniform(key, (N, 3), jnp.float32)  # unit-cube positions
d = jax.random.normal(key, (N, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
g32 = jax.random.normal(key, (N, 32), jnp.float32)

# ---- A. encoder only ------------------------------------------------------
enc = HashEncoder()
ep = enc.init(key, x[:8])

report("A1 encoder fwd only", timeit(
    lambda p, xx: enc.apply(p, xx), ep, x))
report("A2 encoder fwd+grad", timeit(
    lambda p, xx, gg: jax.grad(
        lambda pp: jnp.sum(enc.apply(pp, xx) * gg))(p), ep, x, g32))

# ---- B. full field --------------------------------------------------------
field = NGPRadianceField(aabb=aabb)
fp = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))

xw = x * 3.0 - 1.5  # world coords inside aabb
report("B1 field fwd only", timeit(
    lambda p, xx, dd: field.apply(p, xx, dd), fp, xw, d))


def field_loss(p, xx, dd):
    rgb, sigma = field.apply(p, xx, dd)
    return jnp.sum(rgb) + jnp.sum(sigma)


report("B2 field fwd+grad", timeit(
    lambda p, xx, dd: jax.grad(field_loss)(p, xx, dd), fp, xw, d))

# ---- C. march only --------------------------------------------------------
from nerfacc_tpu import create_grid, with_binary
from nerfacc_tpu.ray_marching import march_rays
from nerfacc_tpu.intersection import ray_aabb_intersect

binary = np.zeros((128, 128, 128), bool)
binary[32:96, 32:96, 32:96] = True
grid = with_binary(
    create_grid(list(aabb), resolution=128, occupied=True),
    jnp.asarray(binary),
)
r = np.random.RandomState(0)
ro = jnp.asarray(r.rand(N_RAYS, 3) * 2 - 1, jnp.float32)
rd = jnp.asarray(r.randn(N_RAYS, 3), jnp.float32)
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
aabb_j = jnp.asarray(aabb, jnp.float32)


def march_only(ro, rd):
    t_min, t_max = ray_aabb_intersect(ro, rd, aabb_j)
    segs = march_rays(
        ro, rd, t_min, t_max, grid,
        render_step_size=5e-3, max_samples_per_ray=1024,
        slots_per_ray=K, coarse_stride=16, probe_dilation=2,
        probe_groups=32,
    )
    return segs.t_starts


report("C march only (16384 rays, K=48)", timeit(march_only, ro, rd))

# ---- D. full train step (the bench) ---------------------------------------
import functools
import optax
from nerfacc_tpu.utils import render_rays

optimizer = optax.adam(5e-4)
opt_state = optimizer.init(fp)
kwargs = dict(
    scene_aabb=aabb_j, render_step_size=5e-3, max_samples_per_ray=1024,
    samples_budget=N, coarse_stride=16, probe_dilation=2,
    compact_rays_fraction=0.75, probe_groups=32,
)
px = jnp.asarray(r.rand(N_RAYS, 3), jnp.float32)


def train_step(params, opt_state, ro, rd, px):
    def loss_fn(p):
        colors, _, _, n, sel = render_rays(
            p, field, ro, rd, grid=grid, render_bkgd=jnp.ones(3),
            aux=px, return_compact=True, **kwargs,
        )
        ph, okm = sel["aux"], sel["ray_ok"][:, None]
        sh = jnp.sum(jnp.where(okm, (colors - ph) ** 2, 0.0))
        sbg = jnp.sum((1.0 - px) ** 2) - jnp.sum(
            jnp.where(okm, (1.0 - ph) ** 2, 0.0)
        )
        return (sh + sbg) / px.size, n

    (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


report("D full train step", timeit(train_step, fp, opt_state, ro, rd, px))
