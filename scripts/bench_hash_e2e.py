"""Round-3 hash isolation bench: where do the NGP step's seconds go?

bench.py --model ngp measured 115k samples/s (~6.8 s/step at 786k
samples) while the primitive microbenches predict a ~0.9 s/step floor
(fwd gathers 2x ~320 ms + sort-scatter ~200 ms + render glue). This
times the REAL module stack layer by layer at bench shapes to find the
gap: encoder fwd / encoder fwd+bwd+adam / query_density fwd /
full-field fwd+bwd — each DCE-proof (outputs summed and consumed).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 786432
REPS = 3


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

    np.asarray(run(args))  # compile + warmup
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(run(args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(
        f"{name:34s} {best * 1e3:9.1f} ms  "
        f"({N / best / 1e6:8.2f} M samples/s)",
        flush=True,
    )
    return best


def main():
    from nerfacc_tpu.models import NGPRadianceField
    from nerfacc_tpu.models.hash_encoding import HashEncoder

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(N, 3), jnp.float32)  # in [0,1]^3
    xw = jnp.asarray(rng.rand(N, 3) * 2 - 1, jnp.float32)  # world
    dirs = jnp.asarray(rng.randn(N, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    enc = HashEncoder()
    ep = enc.init(jax.random.PRNGKey(0), x[:8])
    print(f"N = {N}", flush=True)

    timeit("encoder fwd", lambda p, xx: enc.apply(p, xx), ep, x)

    opt = optax.adam(1e-2, eps=1e-15)
    est = opt.init(ep)

    def enc_train(p, s, xx):
        def loss(pp):
            return jnp.sum(enc.apply(pp, xx) ** 2)

        g = jax.grad(loss)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s

    timeit("encoder fwd+bwd+adam", enc_train, ep, est, x)

    field = NGPRadianceField(aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5))
    fp = field.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.zeros((8, 3))
    )
    timeit(
        "query_density fwd (cull pass)",
        lambda p, xx: field.apply(p, xx, method=field.query_density),
        fp, xw,
    )

    fst = opt.init(fp)

    def field_train(p, s, xx, dd):
        def loss(pp):
            rgb, dens = field.apply(pp, xx, dd)
            return jnp.sum(rgb) + jnp.sum(dens)

        g = jax.grad(loss)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s

    timeit("full field fwd+bwd+adam", field_train, fp, fst, xw, dirs)


if __name__ == "__main__":
    main()
