"""Round-3 decisive hash microbench — DCE-PROOF (consumes full sums).

Lessons baked in from the two earlier scripts:
  * consuming ``out.ravel()[0]`` lets XLA delete most of the op — the
    "0.4 ns gather" and "39 ms scatter" numbers were artifacts. Here
    every output is reduced with a full ``jnp.sum`` inside the jit.
  * big constants must be jit ARGS (a closed-over array is embedded in
    the compile request -> HTTP 413 over the axon tunnel).

Questions this answers (v5e, one chip):
  F1  true 1-D u32 gather floor, flat vs (N, 128)-shaped indices
  F2  gather cost vs payload width k: per-INDEX or per-ELEMENT bound?
      -> decides fewer-levels x wider-features configs (L8/F4, L4/F8)
  F3  full fwd impl vs bare gather (consumer-fusion overhead)
  B1  honest scatter-add cost, x1 / x2-shared-idx / row-payload
  B2  lax.sort cost alone (the unavoidable part of any sorted reduce)
  B3  sorted-reduce WITHOUT scatter: sort + cumsum + ONE searchsorted
      of T queries + gather-diff  (candidate to replace XLA's serial
      post-sort phase, measured 879 ms at 100M corners in-graph)
  B4  segment_sum on PRE-sorted keys with indices_are_sorted=True
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
LT = L * T  # 8.4M entries per feature
B = N * L * 8  # 33.5M corners

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
kidx, kval, kw, kg = jax.random.split(key, 4)

idx2d = jax.random.randint(kidx, (N, L * 8), 0, LT, jnp.int32)
idx1d = idx2d.reshape(-1)
tab_u32 = jax.random.randint(
    kval, (LT,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
).astype(jnp.uint32)
v1 = jax.random.normal(kval, (B,), jnp.float32)
v2 = jax.random.normal(kw, (B,), jnp.float32)

print(f"harness overhead: {timeit(lambda x: x, jnp.zeros((8,))):.3f} ms",
      flush=True)

# ---- F1: bare gather floor ------------------------------------------------
report("F1 gather u32 (33.5M,) flat idx",
       timeit(lambda t, i: t[i], tab_u32, idx1d), per=B)
report("F1 gather u32 (N,128) 2-D idx",
       timeit(lambda t, i: t[i], tab_u32, idx2d), per=B)

# ---- F2: payload-width scaling (per-index vs per-element) -----------------
for k in (1, 2, 4, 8):
    nk = B // k
    tab_k = jax.random.normal(kval, (LT, k), jnp.float32)
    idx_k = idx1d[:nk] % LT
    report(f"F2 row-gather ({nk / 1e6:.1f}M,) x (LT,{k}) f32",
           timeit(lambda t, i: jnp.take(t, i, axis=0), tab_k, idx_k),
           per=nk)

# same total FEATURE elements as the real fwd (2 feats packed u32):
# L=16/F=2 -> 33.5M u32 gathers; L=8/F=4 -> 16.8M x (LT,2) u32;
# L=4/F=8 -> 8.4M x (LT,4) u32
for lvl, kw_ in ((8, 2), (4, 4)):
    nidx = N * lvl * 8
    tab_k = jax.random.randint(
        kval, (LT // kw_, kw_), 0, jnp.iinfo(jnp.int32).max, jnp.int32
    ).astype(jnp.uint32)
    idx_k = idx1d[:nidx] % (LT // kw_)
    report(f"F2 config L={lvl} emulation: {nidx / 1e6:.1f}M x (.,{kw_}) u32",
           timeit(lambda t, i: jnp.take(t, i, axis=0), tab_k, idx_k),
           per=nidx)

# ---- F3: full fwd impl (as in hash_gather._lookup_fwd_impl) ---------------
from nerfacc_tpu.ops.hash_gather import _lookup_fwd_impl  # noqa: E402

tab_flat = jax.random.normal(kval, (2 * LT,), jnp.float32)
cw = jax.random.uniform(kw, (N, L * 8), jnp.float32)
report("F3 full fwd impl (packed u32 path)",
       timeit(lambda t, i, w: _lookup_fwd_impl(t, i, w, True),
              tab_flat, idx2d, cw), per=B)

# ---- B1: honest scatter costs ---------------------------------------------
report("B1 scatter-add x1 (33.5M,)->(8.4M,)",
       timeit(lambda i, v: jnp.zeros((LT,), jnp.float32).at[i].add(v),
              idx1d, v1), per=B)
report("B1 scatter-add x2 shared idx",
       timeit(lambda i, a, b: (
           jnp.zeros((LT,), jnp.float32).at[i].add(a),
           jnp.zeros((LT,), jnp.float32).at[i].add(b)),
              idx1d, v1, v2), per=B)
v_rows = jnp.stack([v1, v2], -1)
report("B1 scatter-add rows (33.5M,2)->(8.4M,2)",
       timeit(lambda i, v: jnp.zeros((LT, 2), jnp.float32).at[i].add(v),
              idx1d, v_rows), per=B)

# ---- B2: sort cost alone ----------------------------------------------------
report("B2 lax.sort (u32 key + 2 f32 payloads)",
       timeit(lambda i, a, b: jax.lax.sort((i, a, b), num_keys=1),
              idx1d, v1, v2), per=B)

# ---- B3: sorted-reduce without scatter -------------------------------------


def sorted_reduce(i, a, b):
    sk, sa, sb = jax.lax.sort((i, a, b), num_keys=1)
    za = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(sa)])
    zb = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(sb)])
    # ub[t] = #elements with key <= t  (one vectorized searchsorted)
    ub = jnp.searchsorted(sk, jnp.arange(LT, dtype=jnp.int32), side="right")
    ub0 = jnp.concatenate([jnp.zeros((1,), ub.dtype), ub[:-1]])
    return za[ub] - za[ub0], zb[ub] - zb[ub0]


report("B3 sort + cumsum + searchsorted diff (no scatter)",
       timeit(sorted_reduce, idx1d, v1, v2), per=B)

# searchsorted alone, to see if it's the bottleneck
sk = jnp.sort(idx1d)
report("B3b searchsorted alone (8.4M queries in 33.5M)",
       timeit(lambda s: jnp.searchsorted(
           s, jnp.arange(LT, dtype=jnp.int32), side="right"), sk), per=LT)

# ---- B4: pre-sorted segment-sum fast path? ---------------------------------
report("B4 scatter-add on SORTED idx (hint sorted)",
       timeit(lambda i, v: jnp.zeros((LT,), jnp.float32).at[i].add(
           v, indices_are_sorted=True), sk, v1), per=B)
report("B4b segment_sum sorted hint",
       timeit(lambda i, v: jax.ops.segment_sum(
           v, i, num_segments=LT, indices_are_sorted=True), sk, v1), per=B)
