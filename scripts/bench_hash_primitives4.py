"""Round-3 hash microbench #4: crack the scatter-add backward.

From bench_hash_primitives3 (v5e, honest consumption):
  gather floor 3.2 ns/idx; row-gather (LT,2) amortizes to 2.5 ns/idx
  (1.25 ns/feature); scatter-add 3.9 ns per f32 add; two scatters do
  NOT batch (2x cost); sort is cheap (61 ms / 33.5M); searchsorted is
  a dead end (1.8 s).

Candidates measured here:
  S1 complex64 scatter-add: one add covers 2 f32 features
  S2 interleaved single scatter (67M -> 16.8M): per-index or per-call?
  S3 bf16 scatter-add (half the bytes; quality cost separate question)
  S4 top-1 / top-k corner subset scatter (8x fewer adds; biased or
     stochastic-unbiased gradient — quality gate decides)
  F4 full fwd impl at bench N=786k (does the 3.2 ns floor hold at 3x?)
  F5 row-gather (LT,2) f32 at 33.5M idx (exact-f32 L16/F2 forward)
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
                jnp.sum(jnp.abs(l).astype(jnp.float32))
                if jnp.iscomplexobj(l)
                else jnp.sum(l.astype(jnp.float32))
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
kidx, kval, kw, kg = jax.random.split(key, 4)

idx1d = jax.random.randint(kidx, (B,), 0, LT, jnp.int32)
v1 = jax.random.normal(kval, (B,), jnp.float32)
v2 = jax.random.normal(kw, (B,), jnp.float32)

# ---- S1: complex64 -----------------------------------------------------
report("S1 scatter-add complex64 (33.5M,)->(8.4M,)",
       timeit(lambda i, a, b: jnp.zeros((LT,), jnp.complex64).at[i].add(
           jax.lax.complex(a, b)), idx1d, v1, v2), per=B)

# ---- S2: interleaved single scatter ------------------------------------
report("S2 interleaved 1-call (67M,)->(16.8M,)",
       timeit(lambda i, a, b: jnp.zeros((2 * LT,), jnp.float32).at[
           jnp.concatenate([2 * i, 2 * i + 1])].add(
           jnp.concatenate([a, b])), idx1d, v1, v2), per=2 * B)

# ---- S3: bf16 ----------------------------------------------------------
report("S3 scatter-add bf16 -> bf16 table",
       timeit(lambda i, v: jnp.zeros((LT,), jnp.bfloat16).at[i].add(v),
              idx1d, v1.astype(jnp.bfloat16)), per=B)

# ---- S4: subset-corner scatter (the 8x lever) ---------------------------
for frac, nb in (("1/8 corners (top-1 / stochastic-1)", B // 8),
                 ("1/4 corners (top-2)", B // 4)):
    report(f"S4 scatter-add x2 shared idx, {frac}",
           timeit(lambda i, a, b: (
               jnp.zeros((LT,), jnp.float32).at[i].add(a),
               jnp.zeros((LT,), jnp.float32).at[i].add(b)),
               idx1d[:nb], v1[:nb], v2[:nb]), per=nb)
report("S4c complex64 1/8 corners",
       timeit(lambda i, a, b: jnp.zeros((LT,), jnp.complex64).at[i].add(
           jax.lax.complex(a, b)), idx1d[:B // 8], v1[:B // 8],
           v2[:B // 8]), per=B // 8)

# ---- F4: full fwd at bench scale ----------------------------------------
from nerfacc_tpu.ops.hash_gather import _lookup_fwd_impl  # noqa: E402

NB = 786432
idx2d_b = jax.random.randint(kidx, (NB, L * 8), 0, LT, jnp.int32)
cw_b = jax.random.uniform(kw, (NB, L * 8), jnp.float32)
tab_flat = jax.random.normal(kval, (2 * LT,), jnp.float32)
report("F4 full fwd impl N=786432 (packed u32)",
       timeit(lambda t, i, w: _lookup_fwd_impl(t, i, w, True),
              tab_flat, idx2d_b, cw_b), per=NB * L * 8)

# ---- F5: exact-f32 row-gather forward (L16/F2) ---------------------------
tab_rows = jax.random.normal(kval, (LT, 2), jnp.float32)
report("F5 row-gather (33.5M,) x (LT,2) f32",
       timeit(lambda t, i: jnp.take(t, i, axis=0), tab_rows, idx1d),
       per=B)

# ---- B: full custom-vjp backward as implemented (_bwd_xla) ---------------
from nerfacc_tpu.ops.hash_gather import _bwd_xla  # noqa: E402

g = jax.random.normal(kg, (N, 2 * L), jnp.float32)
idx2d = idx1d.reshape(N, L * 8)
cw = jax.random.uniform(kw, (N, L * 8), jnp.float32)
report("B current _bwd_xla (2 scatters) N=262144",
       timeit(lambda i, w, gg: _bwd_xla(i, w, gg, (2 * LT,)),
              idx2d, cw, g), per=2 * B)
