"""Standalone on-chip repro for the fused Pallas march kernels.

bench.py's safety-net fallback swallows the device-side exception (it only
prints the type); this runs ``fused_select_grouped`` and ``fused_reselect``
alone, at bench shapes, and prints the full traceback so the Mosaic error
is actually actionable. Run it on the real chip:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/repro_fused_march.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import traceback

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.ops.march_select import fused_reselect, fused_select_grouped

R, G, K, K2 = 12288, 32, 48, 24


def main():
    print("backend:", jax.default_backend(), jax.devices())
    r = np.random.RandomState(0)
    live = jnp.asarray(r.randint(0, 16, size=(R, G)), jnp.int32)
    gsize = jnp.asarray(r.randint(1, 64, size=(R, 1)), jnp.int32)
    t_min = jnp.asarray(r.rand(R), jnp.float32)

    for name, interp in [("select interpret=False", False)]:
        try:
            ts, te, dt, ok = jax.jit(
                lambda a, b, c: fused_select_grouped(
                    a, b, c, k_slots=K, step_size=5e-3, interpret=interp
                )
            )(live, gsize, t_min)
            np.asarray(ts)
            print(f"{name}: OK sum={float(jnp.sum(ts)):.3f}")
        except Exception:
            print(f"{name}: FAILED")
            traceback.print_exc()

    masks = jnp.asarray(r.rand(R, K) > 0.5, jnp.int32)
    ts = jnp.cumsum(jnp.asarray(r.rand(R, K), jnp.float32), axis=1)
    te = ts + 0.01
    dt = jnp.full((R, K), 0.01, jnp.float32)
    try:
        o = jax.jit(
            lambda m, a, b, c: fused_reselect(m, a, b, c, k2=K2, interpret=False)
        )(masks, ts, te, dt)
        np.asarray(o[0])
        print(f"reselect: OK sum={float(jnp.sum(o[0])):.3f}")
    except Exception:
        print("reselect: FAILED")
        traceback.print_exc()


if __name__ == "__main__":
    main()
