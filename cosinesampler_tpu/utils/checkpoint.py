"""Checkpoint/resume for PINN training state via orbax.

The reference has no checkpointing at all — its only state is the caller's
``cells`` Parameter (test/test_2d.py:26).  Here the full training state
(params + optimizer state + step counter) round-trips through orbax, so
long PDE training sweeps can resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_state(directory: str, step: int, state: Dict[str, Any],
               max_to_keep: int = 3) -> None:
    """Save a pytree training state at ``step``."""
    import orbax.checkpoint as ocp
    mngr = _manager(directory, max_to_keep)
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def restore_state(directory: str, template: Dict[str, Any],
                  step: Optional[int] = None) -> tuple[int, Dict[str, Any]]:
    """Restore the latest (or a specific) step; returns (step, state).

    ``template`` is a pytree with the target structure/shapes (e.g. a
    freshly initialized state).
    """
    import orbax.checkpoint as ocp
    mngr = _manager(directory)
    step = mngr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    state = mngr.restore(
        step,
        args=ocp.args.StandardRestore(jax.tree_util.tree_map(lambda x: x,
                                                             template)))
    mngr.close()
    return step, state
