"""Checkpoint round-trip: params + grid + step survive save/restore."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu import create_grid, update_grid
from nerfacc_tpu.checkpoint import CheckpointManager
from nerfacc_tpu.models import VanillaNeRFRadianceField


def test_checkpoint_roundtrip():
    field = VanillaNeRFRadianceField(net_depth=2, net_width=16)
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.zeros((4, 3))
    )
    grid = create_grid([-1, -1, -1, 1, 1, 1], resolution=8)
    grid = update_grid(
        grid, jax.random.PRNGKey(1), step=0,
        occ_eval_fn=lambda x: (jnp.linalg.norm(x, axis=-1, keepdims=True) < 0.5).astype(jnp.float32),
    )
    state = {"params": params, "grid": grid, "step": 123}

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save(123, state, wait=True)
        assert mgr.latest_step() == 123

        template = {
            "params": jax.tree.map(jnp.zeros_like, params),
            "grid": create_grid([-1, -1, -1, 1, 1, 1], resolution=8),
            "step": 0,
        }
        restored = mgr.restore(template)
        mgr.close()

    chex_equal = lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b)
    )
    jax.tree.map(chex_equal, restored["params"], params)
    np.testing.assert_array_equal(
        np.asarray(restored["grid"].binary), np.asarray(grid.binary)
    )
    chex_equal(restored["grid"].occs, grid.occs)
    assert int(restored["step"]) == 123
