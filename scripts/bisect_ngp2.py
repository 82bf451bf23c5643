"""DCE-proof bisect: consume EVERY output (sum of all leaves) so XLA
cannot dead-code-eliminate the backward. Round-3 lesson: reducing to
leaf[0] let XLA delete most of the step in the first bisect."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N_RAYS = 16384
K = 48
N = N_RAYS * K


def timeit(fn, *args, reps=3):
    @jax.jit
    def run(args):
        def body(c, _):
            a = jax.lax.optimization_barrier(args)
            out = fn(*a)
            # consume EVERYTHING: sum of all leaves (DCE-proof)
            tot = sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(out)
            )
            return c + tot, None

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

x = jax.random.uniform(key, (N, 3), jnp.float32)
d = jax.random.normal(key, (N, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
g32 = jax.random.normal(key, (N, 32), jnp.float32)

enc = HashEncoder()
ep = enc.init(key, x[:8])

report("encoder fwd (consume all)", timeit(
    lambda p, xx: enc.apply(p, xx), ep, x))
report("encoder fwd+grad (consume all)", timeit(
    lambda p, xx, gg: jax.grad(
        lambda pp: jnp.sum(enc.apply(pp, xx) * gg))(p), ep, x, g32))

field = NGPRadianceField(aabb=aabb)
fp = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
xw = x * 3.0 - 1.5


def field_loss(p, xx, dd):
    rgb, sigma = field.apply(p, xx, dd)
    return jnp.sum(rgb) + jnp.sum(sigma)


report("field fwd (consume all)", timeit(
    lambda p, xx, dd: field.apply(p, xx, dd), fp, xw, d))
report("field fwd+grad (consume all)", timeit(
    lambda p, xx, dd: jax.grad(field_loss)(p, xx, dd), fp, xw, d))

# encoder grad split: scatter alone at model-computed indices
tbl = ep["params"]["table"]
print(f"table shape {tbl.shape}", flush=True)
