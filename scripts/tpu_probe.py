"""Fast TPU-tunnel liveness probe.

Registers the axon backend explicitly with a short ``claim_timeout_s``
(the sitecustomize default waits ~25 min before failing UNAVAILABLE when
the server side is down), runs one trivial device op, prints ``TPU_OK``
and exits 0 — or exits 1 within ~the timeout when the tunnel is down.

Run with ``PALLAS_AXON_POOL_IPS`` **unset** so sitecustomize skips its own
(long-timeout) registration:

    env -u PALLAS_AXON_POOL_IPS python scripts/tpu_probe.py [timeout_s]
"""

import os
import sys
import uuid

os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
os.environ["AXON_LOOPBACK_RELAY"] = "1"
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ["JAX_PLATFORMS"] = "axon"

sys.path.insert(0, "/root/.axon_site")


def main() -> int:
    timeout_s = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    from axon.register import register

    try:
        register(
            None,
            f"{gen}:1x1x1",
            so_path="/opt/axon/libaxon_pjrt.so",
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1")
            == "1",
            claim_timeout_s=timeout_s,
        )
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_platforms", "axon")
        val = float(jnp.ones((8,)).sum())
    except Exception as e:  # noqa: BLE001 - any failure means "down"
        print(f"TPU_DOWN: {type(e).__name__}: {str(e)[:200]}")
        return 1
    assert val == 8.0, val
    print("TPU_OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
