"""Segmented-scan keystone ops vs. brute-force numpy oracles."""

import numpy as np
import jax.numpy as jnp

from nerfacc_tpu.scan import (
    exclusive_segment_cumsum,
    inclusive_segment_cumsum,
    reverse_exclusive_segment_cumsum,
    exclusive_segment_cumprod,
)


def _brute(x, seg, n, kind):
    out = np.zeros_like(x)
    for s in range(n):
        idx = np.where(seg == s)[0]
        v = x[idx]
        if kind == "excl":
            out[idx] = np.cumsum(v) - v
        elif kind == "incl":
            out[idx] = np.cumsum(v)
        elif kind == "rev_excl":
            out[idx] = np.cumsum(v[::-1])[::-1] - v
        elif kind == "prod_excl":
            c = np.cumprod(v)
            out[idx] = np.concatenate([[1.0], c[:-1]])
    return out


def test_segment_scans_match_bruteforce():
    rng = np.random.RandomState(0)
    n_rays = 7
    seg = np.sort(rng.randint(0, n_rays, size=50)).astype(np.int32)
    x = rng.rand(50).astype(np.float32)

    for fn, kind in [
        (exclusive_segment_cumsum, "excl"),
        (inclusive_segment_cumsum, "incl"),
        (reverse_exclusive_segment_cumsum, "rev_excl"),
    ]:
        got = np.asarray(fn(jnp.array(x), jnp.array(seg), n_rays))
        want = _brute(x, seg, n_rays, kind)
        # atol 1e-5: the global-cumsum-minus-offset form leaves a few-ULP
        # residue at segment starts where the exact answer is 0
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    got = np.asarray(
        exclusive_segment_cumprod(jnp.array(x), jnp.array(seg), n_rays)
    )
    want = _brute(x, seg, n_rays, "prod_excl")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_segment_cumprod_zero_propagation():
    x = jnp.array([0.5, 0.0, 0.3, 0.9, 1.0, 0.0, 0.2], jnp.float32)
    seg = jnp.array([0, 0, 0, 0, 1, 1, 1], jnp.int32)
    got = np.asarray(exclusive_segment_cumprod(x, seg, 2))
    want = np.array([1.0, 0.5, 0.0, 0.0, 1.0, 1.0, 0.0], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
