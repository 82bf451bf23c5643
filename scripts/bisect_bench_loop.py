"""Why does bench.py --model ngp measure ~4.5 s/step when the identical
step body times at 826 ms inside a lax.scan? Suspects: per-dispatch tunnel
overhead, buffer donation, params threading (adam update feeding the next
step's gather/scatter).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

N_RAYS = 16384
K = 48
N = N_RAYS * K

from nerfacc_tpu import create_grid, with_binary
from nerfacc_tpu.models import NGPRadianceField
from nerfacc_tpu.utils import render_rays

key = jax.random.PRNGKey(0)
aabb = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)
aabb_j = jnp.asarray(aabb, jnp.float32)

field = NGPRadianceField(aabb=aabb)
params = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
binary = np.zeros((128, 128, 128), bool)
binary[32:96, 32:96, 32:96] = True
grid = with_binary(
    create_grid(list(aabb), resolution=128, occupied=True), jnp.asarray(binary)
)
optimizer = optax.adam(5e-4)
opt_state = optimizer.init(params)
kwargs = dict(
    scene_aabb=aabb_j, render_step_size=5e-3, max_samples_per_ray=1024,
    samples_budget=N, coarse_stride=16, probe_dilation=2,
    compact_rays_fraction=0.75, probe_groups=32, use_pallas=None,
)

# 0. dispatch overhead of a trivial jitted fn through the tunnel
triv = jax.jit(lambda x: x + 1.0)
z = jnp.zeros((8,), jnp.float32)
np.asarray(triv(z))
t0 = time.perf_counter()
for _ in range(20):
    z = triv(z)
np.asarray(z)
print(f"trivial dispatch: {(time.perf_counter()-t0)/20*1e3:.1f} ms/iter",
      flush=True)


def make_train_step(donate):
    def train_step(params, opt_state, n_acc, rays_o, rays_d, pixels):
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

        (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, n_acc + n, loss

    if donate:
        return jax.jit(train_step, donate_argnums=(0, 1, 2))
    return jax.jit(train_step)


r = np.random.RandomState(0)
ITERS = 5
o = jnp.asarray(r.rand(ITERS + 1, N_RAYS, 3) * 2 - 1, jnp.float32)
d = jnp.asarray(r.randn(ITERS + 1, N_RAYS, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
px = jnp.asarray(r.rand(ITERS + 1, N_RAYS, 3), jnp.float32)

for donate in (False, True):
    ts = make_train_step(donate)
    p, s = params, opt_state
    n_acc = jnp.zeros((), jnp.int32)
    p, s, n_acc, loss = ts(p, s, n_acc, o[0], d[0], px[0])
    np.asarray(loss)
    n_acc = jnp.zeros((), jnp.int32)
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        p, s, n_acc, loss = ts(p, s, n_acc, o[i], d[i], px[i])
    n_total = int(np.asarray(n_acc))
    dt = time.perf_counter() - t0
    print(
        f"python-loop donate={donate}: {dt/ITERS*1e3:.0f} ms/step, "
        f"n/step={n_total//ITERS}, {n_total/dt/1e3:.0f}k samples/s",
        flush=True,
    )
