"""Test config: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to test multi-chip sharding without hardware;
the same code paths run unchanged on a real TPU slice.
"""

import os

# Force CPU: the shell env pins JAX_PLATFORMS=axon (the real TPU tunnel);
# unit tests must run on the virtual 8-device CPU mesh, and eager test ops
# over the tunnel are pathologically slow. The axon sitecustomize imports
# jax at interpreter start, which snapshots JAX_PLATFORMS into jax.config
# before this file runs — so update the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: repeated test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (after env setup on purpose)

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
