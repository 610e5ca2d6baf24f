"""Checkpoint/resume via orbax.

Replaces the reference's raw ``state_dict``/pickle checkpointing
(reference: learning/base_agent.py:127-163, diffusion/motion_generator.py:
33-39) with orbax pytree checkpoints; unlike the reference, optimizer state
and RNG are checkpointed too, so resume is bit-exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _mgr(directory: str):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True))


def save(directory: str, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp
    mgr = _mgr(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def restore(directory: str, state_like: Any,
            step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp
    mgr = _mgr(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    return mgr.restore(step, args=ocp.args.StandardRestore(state_like))


def latest_step(directory: str) -> Optional[int]:
    mgr = _mgr(directory)
    return mgr.latest_step()
