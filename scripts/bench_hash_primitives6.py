"""Round-3 hash microbench #6: scatter-add size scaling.

bisect_ngp3 found the full-table scatter superlinear: 33.5M corners =
39 ms (1.16 ns/elem) but 100.7M = 600 ms/feature (6 ns/elem), and the
shared-idx two-feature variadic batching stops happening (2x cost).
Hypothesis: per-LEVEL scatters (16 sorts of 6.3M corners into 524k
entries) stay on the fast curve. Variants measured:

  S1  one flat scatter, 100.7M -> (8.4M,), x2 features (the current bwd)
  S2  per-level scatters, 16 x [6.3M -> (524k,)] x2 features
  S3  per-level, features interleaved: 16 x [12.6M -> (1.05M,)] x1
  S4  size curve: one scatter at 6.3M / 12.6M / 25M / 50M (x1 feature)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N8 = 786432 * 8  # corners per level at bench N
L = 16
T = 1 << 19
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
    print(f"{name:46s} {best * 1e3:9.1f} ms", flush=True)
    return best


def main():
    rng = np.random.RandomState(0)
    # per-level index/value streams (N8 corners each)
    idx_l = jnp.asarray(rng.randint(0, T, (L, N8)), jnp.int32)
    v0_l = jnp.asarray(rng.rand(L, N8), jnp.float32)
    v1_l = jnp.asarray(rng.rand(L, N8), jnp.float32)

    # S1: current backward — flat over all levels
    off = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
    flat_idx = (idx_l + off).reshape(-1)
    fv0, fv1 = v0_l.reshape(-1), v1_l.reshape(-1)

    def s1(idx, a, b):
        return (
            jnp.zeros((L * T,), jnp.float32).at[idx].add(a),
            jnp.zeros((L * T,), jnp.float32).at[idx].add(b),
        )

    timeit("S1 flat 100.7M x2 (current)", s1, flat_idx, fv0, fv1)

    # S2: per-level, two features sharing the level's idx
    def s2(idx_l, v0_l, v1_l):
        outs = []
        for l in range(L):
            outs.append(
                jnp.zeros((T,), jnp.float32).at[idx_l[l]].add(v0_l[l])
            )
            outs.append(
                jnp.zeros((T,), jnp.float32).at[idx_l[l]].add(v1_l[l])
            )
        return outs

    timeit("S2 per-level 16x[6.3M->524k] x2", s2, idx_l, v0_l, v1_l)

    # S3: per-level, features interleaved into one stream
    def s3(idx_l, v0_l, v1_l):
        outs = []
        for l in range(L):
            i2 = jnp.concatenate([idx_l[l] * 2, idx_l[l] * 2 + 1])
            v2 = jnp.concatenate([v0_l[l], v1_l[l]])
            outs.append(jnp.zeros((2 * T,), jnp.float32).at[i2].add(v2))
        return outs

    timeit("S3 per-level 16x[12.6M->1.05M] x1", s3, idx_l, v0_l, v1_l)

    # S4: size curve, single scatter into (8.4M,)
    for m in (1, 2, 4, 8):
        n = N8 * m

        def s4(idx, v):
            return jnp.zeros((L * T,), jnp.float32).at[idx].add(v)

        timeit(
            f"S4 one scatter @{n/1e6:.1f}M -> 8.4M",
            s4, flat_idx[:n], fv0[:n],
        )


if __name__ == "__main__":
    main()
