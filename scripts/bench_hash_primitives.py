"""Measure TPU primitive costs that bound any hash-grid NGP design.

Run on the real chip. Timing methodology (the 'axon' tunnel platform's
``block_until_ready`` does NOT synchronize): run K iterations inside one
jitted ``lax.scan`` whose body is isolated with ``optimization_barrier``
(so XLA can't hoist loop-invariant work), then force a single host
readback of a scalar derived from every iteration's output.

The hash-NGP budget (reference ``examples/radiance_fields/ngp.py:108-145``):
N samples/step, L=16 levels, 8 corners, F=2 features. Forward needs
N*L*8 gathered feature pairs; backward needs the same count scattered
(with duplicates) into per-level tables of T=2^19 entries.

5M samples/s at N=262144 means a 52 ms step; the encoder can use ~25 ms
of it. That budget, over 33.5M corner ops, is ~0.7 ns/corner.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 262144  # samples per step (reference bounded target 2^18)
L = 16
T = 1 << 19
F = 2
B = N * 8  # corners per level
K_REPS = 10


def timeit(fn, *args, reps=K_REPS):
    """Median-free single-shot: K chained reps in one jit, one readback."""

    @jax.jit
    def run(args):
        def body(c, _):
            a = jax.lax.optimization_barrier(args)
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.ravel()[0].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)
        return c

    np.asarray(run(args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(args))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(run(args))
    dt2 = time.perf_counter() - t0
    return min(dt1, dt2) / reps * 1e3  # ms per iteration


def report(name, ms, n_elem, notes=""):
    print(
        f"{name:44s} {ms:9.3f} ms   {ms * 1e6 / n_elem:8.3f} ns/elem  {notes}",
        flush=True,
    )


key = jax.random.PRNGKey(0)
kidx, kval, kw = jax.random.split(key, 3)

# baseline: dispatch/readback overhead of the harness itself
ms = timeit(lambda x: x, jnp.zeros((8,), jnp.float32))
print(f"harness overhead: {ms:.4f} ms/iter", flush=True)

# calibration: known-cost ops
a8k = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
ms = timeit(lambda a: a @ a, a8k)
print(f"matmul 8192^3 bf16: {ms:.3f} ms -> {2 * 8192**3 / ms / 1e9:.0f} GFLOP/s", flush=True)
big = jax.random.normal(key, (256 * 1024 * 1024,), jnp.float32)
ms = timeit(lambda x: x + 1.0, big)
print(f"1GB elementwise: {ms:.3f} ms -> {2 * big.nbytes / ms / 1e6:.0f} GB/s", flush=True)

# ---- forward gather variants -------------------------------------------
flat_idx = jax.random.randint(kidx, (N, L * 8), 0, L * T, jnp.int32)
cw = jax.random.uniform(kw, (N, L * 8), jnp.float32)
table = jax.random.normal(kval, (L * T, F), jnp.float32)
table_bf = table.astype(jnp.bfloat16)


def fwd_two_1d_gathers(table, flat_idx, cw):
    f0 = (table[:, 0][flat_idx] * cw).reshape(N, L, 8).sum(-1)
    f1 = (table[:, 1][flat_idx] * cw).reshape(N, L, 8).sum(-1)
    return jnp.stack([f0, f1], axis=-1)


def fwd_row_gather(table, flat_idx, cw):
    g = jnp.take(table, flat_idx.reshape(-1), axis=0)  # (N*L*8, 2)
    g = g.reshape(N, L * 8, 2) * cw[..., None]
    return g.reshape(N, L, 8, 2).sum(2)


def fwd_interleaved_1d(table, flat_idx, cw):
    tflat = table.reshape(-1)
    i2 = flat_idx * 2
    f0 = (tflat[i2] * cw).reshape(N, L, 8).sum(-1)
    f1 = (tflat[i2 + 1] * cw).reshape(N, L, 8).sum(-1)
    return jnp.stack([f0, f1], axis=-1)


report("fwd: two (N,L*8) 1-D gathers f32",
       timeit(fwd_two_1d_gathers, table, flat_idx, cw), N * L * 8 * 2)
report("fwd: two 1-D gathers bf16 table",
       timeit(fwd_two_1d_gathers, table_bf, flat_idx, cw), N * L * 8 * 2)
report("fwd: (N*L*8,2) row gather f32",
       timeit(fwd_row_gather, table, flat_idx, cw), N * L * 8 * 2)
report("fwd: interleaved flat 1-D gather",
       timeit(fwd_interleaved_1d, table, flat_idx, cw), N * L * 8 * 2)

for t_small in (1 << 14, 1 << 16, 1 << 19):
    tbl = jax.random.normal(kval, (t_small,), jnp.float32)
    idx_s = jax.random.randint(kidx, (N, L * 8), 0, t_small, jnp.int32)

    def fwd_small(tbl, idx_s, cw):
        return (tbl[idx_s] * cw).reshape(N, L, 8).sum(-1)

    report(f"fwd: 1 gather, table {t_small >> 10}K entries",
           timeit(fwd_small, tbl, idx_s, cw), N * L * 8)

# ---- backward scatter variants -----------------------------------------
idx1 = jax.random.randint(kidx, (B,), 0, T, jnp.int32)
v1 = jax.random.normal(kval, (B,), jnp.float32)
v2 = jax.random.normal(kval, (B, 2), jnp.float32)


def scat_1d(idx1, v1):
    return jnp.zeros((T,), jnp.float32).at[idx1].add(v1)


def scat_2d(idx1, v2):
    return jnp.zeros((T, 2), jnp.float32).at[idx1].add(v2)


def seg_sum(idx1, v1):
    return jax.ops.segment_sum(v1, idx1, num_segments=T)


report("bwd: XLA scatter-add (B,)->(T,)", timeit(scat_1d, idx1, v1), B, f"B={B}")
report("bwd: XLA scatter-add (B,2)->(T,2)", timeit(scat_2d, idx1, v2), B * 2)
report("bwd: segment_sum unsorted", timeit(seg_sum, idx1, v1), B)

idx_sorted = jnp.sort(idx1)
report("bwd: XLA scatter-add sorted idx", timeit(scat_1d, idx_sorted, v1), B)
report("bwd: segment_sum sorted-idx input", timeit(seg_sum, idx_sorted, v1), B)


def seg_sum_hint(idx1, v1):
    return jax.ops.segment_sum(
        v1, idx1, num_segments=T, indices_are_sorted=True
    )


report("bwd: segment_sum sorted+hint", timeit(seg_sum_hint, idx_sorted, v1), B)

# ---- sort costs ---------------------------------------------------------
report("sort_key_val (B,) int32+f32",
       timeit(lambda i, v: jax.lax.sort_key_val(i, v), idx1, v1), B)
report("sort 1 key + 2 payloads",
       timeit(lambda i, a, b: jax.lax.sort((i, a, b), num_keys=1), idx1, v1, v1), B)
report("sort keys only", timeit(jnp.sort, idx1), B)


def bwd_sorted_scatter(idx1, v1):
    sk, sv = jax.lax.sort_key_val(idx1, v1)
    return jnp.zeros((T,), jnp.float32).at[sk].add(sv, indices_are_sorted=True)


report("bwd: sort + scatter(sorted hint)", timeit(bwd_sorted_scatter, idx1, v1), B)

# ---- one-hot matmul for a SMALL table (coarse level) ---------------------
for t_small in (4096,):
    idx_s = jax.random.randint(kidx, (B,), 0, t_small, jnp.int32)

    def onehot_mm(idx_s, v2):
        C = 8192
        nchunks = B // C

        def body(carry, inp):
            i, v = inp
            oh = jax.nn.one_hot(i, t_small, dtype=jnp.bfloat16)
            return carry + jnp.dot(
                oh.T, v.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            ), None

        out, _ = jax.lax.scan(
            body,
            jnp.zeros((t_small, 2), jnp.float32),
            (idx_s.reshape(nchunks, C), v2.reshape(nchunks, C, 2)),
        )
        return out

    report(f"bwd: one-hot matmul T={t_small}", timeit(onehot_mm, idx_s, v2), B)

# ---- XLA full encoder fwd+bwd at bench scale -----------------------------
g = jax.random.normal(kval, (N, L, 2), jnp.float32)


def enc_fwd_bwd(table, flat_idx, cw, g):
    def f(tbl):
        f0 = (tbl[:, 0][flat_idx] * cw).reshape(N, L, 8).sum(-1)
        f1 = (tbl[:, 1][flat_idx] * cw).reshape(N, L, 8).sum(-1)
        return jnp.sum(jnp.stack([f0, f1], -1) * g)

    return jax.grad(f)(table)


try:
    report("full XLA encoder fwd+grad", timeit(enc_fwd_bwd, table, flat_idx, cw, g),
           N * L * 8 * 2, "per step")
except Exception as e:  # noqa: BLE001
    print(f"full XLA encoder fwd+grad FAILED: {type(e).__name__}: {str(e)[:200]}")
