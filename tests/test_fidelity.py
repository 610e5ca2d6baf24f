"""Physics-fidelity regression (tools/fidelity.py).

Pins the open-loop PD-replay tracked reward on the fixed clip set so
contact/limit changes that degrade trackability fail loudly.  The pinned
values were measured on the XLA CPU path; the TPU Pallas path is parity-
tested separately (tests/test_pallas.py::test_tpu_full_parity).
"""

import jax
import numpy as np
import pytest

from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.physics import engine
from parc_tpu.tools import fidelity


@pytest.fixture(scope="module")
def replay_results():
    from parc_tpu.data.synthetic import standing_clip, walking_clip
    model = humanoid_spec().build()
    clips = {"stand": standing_clip(), "walk": walking_clip(seed=1)}
    return {r.clip: r for r in fidelity.pd_replay(
        model, engine.SimParams(use_pallas=False), clips)}


def test_replay_reward_pinned(replay_results):
    """Measured on round-2 CPU: stand 1.448/0.43, walk 0.873/0.35.
    Regression bounds leave ~15% headroom for cross-version jitter."""
    stand = replay_results["stand"]
    walk = replay_results["walk"]
    assert stand.mean_reward > 1.2, stand
    assert stand.survival > 0.30, stand
    assert walk.mean_reward > 0.74, walk
    assert walk.survival > 0.24, walk


def test_replay_tracking_error_bounded(replay_results):
    """Pre-failure tracking errors stay in a physically sane range."""
    for r in replay_results.values():
        assert np.all(np.isfinite(r.tracking_error)), r
        # root position error (component 0) under 0.5 m pre-failure
        assert r.tracking_error[0] < 0.5, r
