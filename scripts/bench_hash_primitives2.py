"""Round-3 follow-up: levers to close the gap from 3.4M to 5M samples/s.

Round-3 first measurements (hash_primitives.log, v5e, N=262144):
  fwd row gather (N*L*8,2)    26.1 ms  (0.39 ns/elem — NOT 9 ns as assumed)
  full XLA encoder fwd+grad   76.0 ms  -> 3.4M samples/s encoder-only
  scatter-add (B,)->(T,)      1.93 ns/elem at B=2.1M
So XLA's own grad path is ~145x the round-2 serial Pallas kernel.
This script measures what moves the remaining 2x.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 262144
L = 16
T = 1 << 19
F = 2
K_REPS = 10


def timeit(fn, *args, reps=K_REPS):
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
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(run(args))
    dt2 = time.perf_counter() - t0
    return min(dt1, dt2) / reps * 1e3


def report(name, ms, notes=""):
    print(f"{name:52s} {ms:9.3f} ms  {notes}", flush=True)


key = jax.random.PRNGKey(0)
kidx, kval, kw, kg = jax.random.split(key, 4)

flat_idx = jax.random.randint(kidx, (N, L * 8), 0, L * T, jnp.int32)
cw = jax.random.uniform(kw, (N, L * 8), jnp.float32)
table = jax.random.normal(kval, (L * T, F), jnp.float32)
g = jax.random.normal(kg, (N, L, 2), jnp.float32)

ms0 = timeit(lambda x: x, jnp.zeros((8,), jnp.float32))
print(f"harness overhead: {ms0:.4f} ms/iter", flush=True)

# --- scatter-add at full scale (the whole backward) ----------------------
BT = N * L * 8  # 33.5M corner cotangents
idx_flat = flat_idx.reshape(-1)
v_flat = jax.random.normal(kval, (BT,), jnp.float32)
v2_flat = jax.random.normal(kval, (BT, 2), jnp.float32)

report("scat (33.5M,)->(8.4M,) f32",
       timeit(lambda i, v: jnp.zeros((L * T,), jnp.float32).at[i].add(v),
              idx_flat, v_flat))
v_flat_b = jax.random.normal(kw, (BT,), jnp.float32)
report("scat x2 features (two 1-D scatters, distinct v)",
       timeit(lambda i, v, vb: (jnp.zeros((L * T,), jnp.float32).at[i].add(v),
                                jnp.zeros((L * T,), jnp.float32).at[i].add(vb)),
              idx_flat, v_flat, v_flat_b))
# hand-rolled: ONE sort with two payloads + boundary-diff segment sums
def sort_based_2f(i, v, vb):
    sk, sv, svb = jax.lax.sort((i, v, vb), num_keys=1)
    c0 = jnp.cumsum(sv)
    c1 = jnp.cumsum(svb)
    last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    # scatter per-run inclusive-cumsum diffs at unique sorted positions
    d0 = jnp.where(last, c0, 0.0)
    d1 = jnp.where(last, c1, 0.0)
    t0 = jnp.zeros((L * T,), jnp.float32).at[jnp.where(last, sk, L * T)].add(d0, mode="drop")
    t1 = jnp.zeros((L * T,), jnp.float32).at[jnp.where(last, sk, L * T)].add(d1, mode="drop")
    # subtract previous-run cumsum: shift the per-entry cumsum table
    # (approximation of cost: the diff-before-scatter variant)
    return t0, t1
report("scat hand sort1x + 2 cumsum + 2 unique-scat",
       timeit(sort_based_2f, idx_flat, v_flat, v_flat_b))
report("scat bf16 values -> f32 table",
       timeit(lambda i, v: jnp.zeros((L * T,), jnp.float32)
              .at[i].add(v.astype(jnp.float32)),
              idx_flat, v_flat.astype(jnp.bfloat16)))

# --- forward formulations with grad --------------------------------------


def fwd_row(tbl, fi, w):
    gv = jnp.take(tbl, fi.reshape(-1), axis=0)  # (N*L*8, 2)
    gv = gv.reshape(N, L * 8, 2) * w[..., None]
    return gv.reshape(N, L, 8, 2).sum(2)


def fwd_1d(tbl, fi, w):
    f0 = (tbl[:, 0][fi] * w).reshape(N, L, 8).sum(-1)
    f1 = (tbl[:, 1][fi] * w).reshape(N, L, 8).sum(-1)
    return jnp.stack([f0, f1], -1)


for name, f in [("row-gather", fwd_row), ("two-1d", fwd_1d)]:
    report(f"enc fwd only ({name})",
           timeit(lambda t, fi, w, f=f: f(t, fi, w), table, flat_idx, cw))
    report(f"enc fwd+grad ({name})",
           timeit(lambda t, fi, w, gg, f=f: jax.grad(
               lambda tt: jnp.sum(f(tt, fi, w) * gg))(t),
               table, flat_idx, cw, g))

report("enc manual-bwd cotangent+scatter",
       timeit(lambda fi, w, gg: (
           jnp.zeros((L * T,), jnp.float32).at[fi.reshape(-1)].add(
               (w * jnp.repeat(gg[:, :, 0], 8, axis=1)).reshape(-1)),
           jnp.zeros((L * T,), jnp.float32).at[fi.reshape(-1)].add(
               (w * jnp.repeat(gg[:, :, 1], 8, axis=1)).reshape(-1)),
       ), flat_idx, cw, g))

# --- full NGP field (encoder + MLPs) fwd+bwd ------------------------------
k1, k2, k3 = jax.random.split(key, 3)
w1 = jax.random.normal(k1, (L * F, 64), jnp.float32) * 0.1
w2 = jax.random.normal(k2, (64, 16), jnp.float32) * 0.1
wrgb1 = jax.random.normal(k3, (16 + 16, 64), jnp.float32) * 0.1
wrgb2 = jax.random.normal(k1, (64, 64), jnp.float32) * 0.1
wrgb3 = jax.random.normal(k2, (64, 3), jnp.float32) * 0.1
sh = jax.random.normal(k3, (N, 16), jnp.float32)


def field(params, fi, w):
    tbl, w1, w2, a, b, c = params
    h = fwd_1d(tbl, fi, w).reshape(N, L * F)
    h = jax.nn.relu(h @ w1)
    h = h @ w2
    sigma = h[:, :1]
    emb = jnp.concatenate([h, sh], -1)
    r = jax.nn.relu(emb @ a)
    r = jax.nn.relu(r @ b)
    rgb = jax.nn.sigmoid(r @ c)
    return jnp.sum(rgb) + jnp.sum(sigma)


params = (table, w1, w2, wrgb1, wrgb2, wrgb3)
report("full NGP field fwd+grad (N=262144)",
       timeit(lambda p, fi, w: jax.grad(field)(p, fi, w)[0],
              params, flat_idx, cw))

# --- does N scale linearly? ------------------------------------------------
for n_small in (65536, 131072):
    def fwd_small(tbl, fi, w, n=n_small):
        f0 = (tbl[:, 0][fi] * w).reshape(n, L, 8).sum(-1)
        f1 = (tbl[:, 1][fi] * w).reshape(n, L, 8).sum(-1)
        return jnp.stack([f0, f1], -1)

    report(f"enc fwd+grad N={n_small}",
           timeit(lambda t, fi, w, gg, f=fwd_small: jax.grad(
               lambda tt: jnp.sum(f(tt, fi, w) * gg))(t),
               table, flat_idx[:n_small], cw[:n_small], g[:n_small]))
