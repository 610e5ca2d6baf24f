"""Checkpoint/resume via orbax.

Replaces the reference's raw ``state_dict``/pickle checkpointing
(reference: learning/base_agent.py:127-163, diffusion/motion_generator.py:
33-39) with orbax pytree checkpoints; unlike the reference, optimizer state
and RNG are checkpointed too, so resume is bit-exact.

History retention: the reference keeps the full ``model_{iter}`` history
(checkpoints/model_0000000200.pt, ...) which its epoch-sweep metric
scripts consume (tools/motion_tests/compute_losses.py).  ``keep=None``
(the default) mirrors that — every checkpoint is retained so
``tools/validation.py`` can sweep them; pass a number to bound disk use.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import jax


def _mgr(directory: str, keep: Optional[int] = None):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True))


def save(directory: str, step: int, state: Any,
         keep: Optional[int] = None) -> None:
    import orbax.checkpoint as ocp
    mgr = _mgr(directory, keep)
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


def all_steps(directory: str) -> List[int]:
    """All retained checkpoint steps, ascending (for epoch sweeps)."""
    mgr = _mgr(directory)
    return sorted(mgr.all_steps())
