"""Round-3 hash microbench #5: forward-layout composition costs.

bench_hash_primitives4 showed row-gather from a (LT, 2) f32 operand is
the fastest exact F=2 forward (2.31 ns/idx vs 3.2 for scalar gathers).
But the PARAMETER must stay flat 1-D (a (LT, 2) param tile-pads 64x ->
4.3 GB table + 8.6 GB adam moments, the traced round-3 disaster). This
measures what building the (LT, 2) gather operand from the flat param
costs in-graph, and confirms backward scaling at bench N.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N = 262144
L = 16
T = 1 << 19
LT = L * T
B = N * L * 8
REPS = 3


def timeit(fn, *args, reps=REPS):
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
            body, jnp.zeros((), jnp.float32), None, length=reps
        )
        return c

    np.asarray(run(args))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def report(name, ms, per=None):
    extra = f"  ({ms * 1e6 / per:8.2f} ns/idx)" if per else ""
    print(f"{name:58s} {ms:9.1f} ms{extra}", flush=True)


key = jax.random.PRNGKey(0)
kidx, kval, kw = jax.random.split(key, 3)
idx1d = jax.random.randint(kidx, (B,), 0, LT, jnp.int32)
flat = jax.random.normal(kval, (2 * LT,), jnp.float32)
rows = jnp.stack([flat[:LT], flat[LT:]], -1)

report("M0 control: row-gather from prebuilt (LT,2)",
       timeit(lambda t, i: jnp.take(t, i, axis=0), rows, idx1d), per=B)
report("M1 build (LT,2) from flat + row-gather",
       timeit(lambda f, i: jnp.take(
           jnp.stack([f[:LT], f[LT:]], -1), i, axis=0), flat, idx1d),
       per=B)


def build_barrier(f, i):
    t = jax.lax.optimization_barrier(jnp.stack([f[:LT], f[LT:]], -1))
    return jnp.take(t, i, axis=0)


report("M2 build + barrier + row-gather",
       timeit(build_barrier, flat, idx1d), per=B)
report("M3 control: two flat f32 gathers (no pack)",
       timeit(lambda f, i: (f[:LT][i], f[LT:][i]), flat, idx1d), per=B)

# backward at bench N: 2 flat scatters of 100M (expect ~760 ms if linear)
NB = 786432
BB = NB * L * 8
idxb = jax.random.randint(kidx, (BB,), 0, LT, jnp.int32)
va = jax.random.normal(kval, (BB,), jnp.float32)
vb = jax.random.normal(kw, (BB,), jnp.float32)
report("M4 scatter-add x2 shared idx at N=786k (100M adds x2)",
       timeit(lambda i, a, b: (
           jnp.zeros((LT,), jnp.float32).at[i].add(a),
           jnp.zeros((LT,), jnp.float32).at[i].add(b)),
           idxb, va, vb), per=2 * BB)
# top-1-corner subset at bench N (12.6M idx)
report("M5 scatter-add x2, top-1 corners at N=786k",
       timeit(lambda i, a, b: (
           jnp.zeros((LT,), jnp.float32).at[i].add(a),
           jnp.zeros((LT,), jnp.float32).at[i].add(b)),
           idxb[:BB // 8], va[:BB // 8], vb[:BB // 8]), per=BB // 4)
