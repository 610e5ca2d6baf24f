"""NaN-loss guard: training halts with a debug dump on non-finite metrics.

Reference: learning/ppo_agent.py:242-252 dumps the offending batch to
output/debug_batch.pkl and exits when the loss goes NaN; here the host
loop (pipeline/train_tracker.py) dumps the pre-update persistent state
and raises FloatingPointError.
"""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.envs.base import EnvConfig
from parc_tpu.envs.deepmimic import DeepMimicEnv
from parc_tpu.learning.ppo import PPOAgent, PPOConfig
from parc_tpu.physics import engine
from parc_tpu.pipeline import train_tracker


def _standing_clip(n=90, fps=30.0):
    frames = np.zeros((n, 34), np.float32)
    frames[:, 2] = 0.94
    contacts = np.zeros((n, 15), np.float32)
    contacts[:, [11, 14]] = 1.0
    terrain = md.HostTerrain(
        hf=np.zeros((24, 24), np.float32),
        min_point=np.asarray([-4.8, -4.8]), dxdy=np.asarray([0.4, 0.4]))
    return md.MotionData(frames=frames, fps=fps, contacts=contacts,
                         terrain=terrain)


def test_nan_guard_dumps_and_raises(tmp_path):
    model = humanoid_spec().build()
    env = DeepMimicEnv(model, engine.SimParams(), EnvConfig(num_envs=8))
    lib = ml.build_motion_lib(model, [_standing_clip()])
    agent = PPOAgent(env, PPOConfig(steps_per_iter=8, update_epochs=1,
                                    batch_size=4,
                                    actor_net="fc_2layers_512units",
                                    critic_net="fc_2layers_512units"))
    state = agent.init(lib, jax.random.PRNGKey(0))
    # poison the params: every loss downstream goes NaN on the first iter
    state = state.replace(params=jax.tree.map(
        lambda x: x * jnp.nan, state.params))
    cfg = train_tracker.TrainerConfig(output_dir=str(tmp_path),
                                      iters_per_output=1000,
                                      iters_per_checkpoint=10**9,
                                      use_multichip=False)
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_tracker.train(agent, lib, cfg, state=state, max_iters=3)
    dump = tmp_path / "debug_state.pkl"
    assert dump.exists(), "NaN guard must dump the pre-update state"
    with open(dump, "rb") as f:
        dumped = pickle.load(f)
    # the dump is the persistent sub-pytree (params/opt/normalizer/...)
    assert "params" in dumped or hasattr(dumped, "params") or \
        isinstance(dumped, dict)
