"""Checkpoint / resume (orbax).

The reference has no checkpointing at all (SURVEY §5: no torch.save/load
anywhere); here it is first-class: the whole training state — field
params, optimizer state, occupancy grid (a plain pytree), step — saves and
restores atomically, multi-host safe via orbax.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: ``save(step, state)`` / ``restore(state)``.

    ``state`` is any pytree (dict of params/opt_state/grid/...). Static
    metadata (grid resolution, contraction type) lives in code, not in the
    checkpoint — grids restore via their arrays onto a template.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``template`` (shapes/dtypes must
        match; sharding is taken from the template's arrays)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
