"""Debug: sharded vs single-device equality at reduced bench shapes."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax.sharding import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

sys.path.insert(0, "/root/repo")

from nerfacc_tpu import create_grid, with_binary
from nerfacc_tpu.models import TensoCPRadianceField
from nerfacc_tpu.parallel import make_mesh
from nerfacc_tpu.utils import render_rays

RAYS_PER_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 512

n_dev = 8
mesh = make_mesh()
n_rays = RAYS_PER_DEV * n_dev
k_slots = 64

rng = np.random.RandomState(11)
rays_o = jnp.asarray(rng.rand(n_rays, 3) * 2 - 1, jnp.float32)
rays_d = jnp.asarray(rng.randn(n_rays, 3), jnp.float32)
rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
pixels = jnp.asarray(rng.rand(n_rays, 3), jnp.float32)

aabb = jnp.asarray([-1.5] * 3 + [1.5] * 3)
field = TensoCPRadianceField(
    aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5), levels=((64, 32), (256, 64))
)
params = field.init(jax.random.PRNGKey(1), jnp.zeros((8, 3)), jnp.zeros((8, 3)))
grid = create_grid(aabb, resolution=64, occupied=True)
binary = np.zeros((64, 64, 64), bool)
binary[16:48, 16:48, 16:48] = True
grid = with_binary(grid, jnp.asarray(binary))

kwargs = dict(
    scene_aabb=aabb, render_step_size=2e-2, max_samples_per_ray=1024,
    coarse_stride=16, probe_dilation=2, probe_groups=32,
    compact_rays_fraction=0.875,
)


def loss_and_colors(params, grid, o, d, px):
    def loss_fn(p):
        colors, _, _, _ = render_rays(
            p, field, o, d, grid=grid, render_bkgd=jnp.ones(3),
            samples_budget=o.shape[0] * k_slots, **kwargs,
        )
        return jnp.mean((colors - px) ** 2), colors

    (loss, colors), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, colors, grads


ref_loss, ref_colors, ref_grads = jax.jit(loss_and_colors)(
    params, grid, rays_o, rays_d, pixels
)


def sharded_step(params, grid, o, d, px):
    loss, colors, grads = loss_and_colors(params, grid, o, d, px)
    loss = jax.lax.pmean(loss, axis_name="data")
    grads = jax.lax.pmean(grads, axis_name="data")
    return loss, colors, grads


stepped = jax.jit(
    shard_map(
        sharded_step, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=(P(), P("data"), P()),
        check_rep=False,
    )
)
rep = NamedSharding(mesh, P())
sh = NamedSharding(mesh, P("data"))
got_loss, got_colors, got_grads = stepped(
    jax.device_put(params, rep), jax.device_put(grid, rep),
    jax.device_put(rays_o, sh), jax.device_put(rays_d, sh),
    jax.device_put(pixels, sh),
)

c_ref = np.asarray(ref_colors)
c_got = np.asarray(got_colors)
diff = np.abs(c_ref - c_got)
print("colors: max abs diff", diff.max(), "n mismatched rays (>1e-5):",
      int((diff.max(axis=1) > 1e-5).sum()), "of", n_rays)
bad = np.argsort(-diff.max(axis=1))[:8]
print("worst rays:", bad, "diffs:", diff.max(axis=1)[bad])
print("ref colors:", c_ref[bad[:3]])
print("got colors:", c_got[bad[:3]])
print("loss:", float(ref_loss), float(got_loss))

flat_ref, _ = jax.tree.flatten(ref_grads)
flat_got, _ = jax.tree.flatten(got_grads)
for i, (r, g) in enumerate(zip(flat_ref, flat_got)):
    r = np.asarray(r); g = np.asarray(g)
    scale = max(np.abs(r).max(), 1e-8)
    rel = np.abs(g - r).max() / scale
    print(f"grad[{i}] shape {r.shape} max-rel-to-scale {rel:.3e}")
