"""Round-3 hash microbench #7: row-slice gathers for a voxel-row encoding.

The exact tcnn-parity encoder is ISSUE-bound: 8 scattered corner rows
per (sample, level) = 128 scalar gathers/sample (~3 ns/idx floor). A
voxel-ROW layout (hash the voxel, store its 8 corners' bf16-packed
feature pairs as 8 consecutive u32) needs ONE 32-byte slice gather per
(sample, level) = 16 indices/sample — IF the per-index cost stays
~flat as the slice widens and the (N, L, 8) gather output fuses into
its consumer instead of materializing lane-padded.

  G1 scalar-gather baseline: 12.6M u32 single-element gathers
  G2 slice-8 gather, fused consumer: 12.6M x (8 u32) -> weighted sum
  G3 slice-8 gather at the FULL corner volume for reference: 100.7M u32
     read as 12.6M slices (same bytes as the exact encoder's forward)
  G4 row scatter-add (backward analog): per level, (H, 8) zeros
     .at[idx (790k,)].add(rows (790k, 8))
  G5 per-level slice-8 gather: 16 x [790k x (8 u32)]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N = 786432
L = 16
H = 1 << 16  # voxel rows per level; 16 levels x 65536 x 8 u32 = 34 MB
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
    table = jnp.asarray(
        rng.randint(0, 2**32, L * H * 8, dtype=np.uint64).astype(np.uint32)
    )
    idx_nl = jnp.asarray(rng.randint(0, L * H, (N, L)), jnp.int32)  # rows
    w = jnp.asarray(rng.rand(N, L * 8).astype(np.float32))

    # G1: scalar gathers, one u32 per (sample, level) — issue-cost floor
    def g1(table, idx):
        return jnp.sum(table[idx * 8].astype(jnp.float32))

    timeit("G1 scalar gather 12.6M x u32", g1, table, idx_nl)

    # G2: slice-8 gather fused into weighted-sum consumer
    t2 = table.reshape(L * H, 8)

    def g2(t2, idx, w):
        rows = t2[idx]  # (N, L, 8) u32 via row gather
        vals = rows.astype(jnp.float32)
        return jnp.sum(vals.reshape(N, L * 8) * w)

    timeit("G2 slice-8 row gather 12.6M (fused sum)", g2, t2, idx_nl, w)

    # G3: same bytes as the exact encoder forward (100.7M u32), read as
    # 12.6M slices of 8
    def g3(t2, idx):
        rows = t2[idx]
        return jnp.sum(rows.astype(jnp.float32))

    timeit("G3 slice-8 row gather, plain sum", g3, t2, idx_nl)

    # G5: per-level slice-8 gathers (clean 2-D (N, 8) outputs)
    def g5(t2, idx):
        acc = jnp.zeros((), jnp.float32)
        for l in range(L):
            rows = t2[idx[:, l]]  # (N, 8)
            acc = acc + jnp.sum(rows.astype(jnp.float32))
        return acc

    timeit("G5 per-level 16 x [786k x slice-8]", g5, t2, idx_nl)

    # G4: row scatter-add, per level (backward analog)
    idx_l = jnp.asarray(rng.randint(0, H, (L, N)), jnp.int32)
    vrows = jnp.asarray(rng.rand(L, N, 8).astype(np.float32))

    def g4(idx_l, vrows):
        outs = []
        for l in range(L):
            outs.append(
                jnp.zeros((H, 8), jnp.float32).at[idx_l[l]].add(vrows[l])
            )
        return outs

    timeit("G4 row scatter 16 x [(H,8)+=786kx8]", g4, idx_l, vrows)

    # G4b: flat scalar scatter equivalent volume (what the exact bwd does)
    fidx = (idx_l[0] * 8)[None].repeat(8, 0).reshape(-1)
    fv = vrows[0].T.reshape(-1)

    def g4b(fidx, fv):
        return jnp.zeros((H * 8,), jnp.float32).at[fidx].add(fv)

    timeit("G4b flat scalar scatter 6.3M (1 level)", g4b, fidx, fv)


if __name__ == "__main__":
    main()
