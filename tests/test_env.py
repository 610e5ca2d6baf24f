"""DeepMimic env tests: shapes, rollout sanity, tracking-from-ref behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.envs.base import DoneFlags, EnvConfig
from parc_tpu.envs.deepmimic import DeepMimicEnv
from parc_tpu.physics import engine


@pytest.fixture(scope="module")
def model():
    return humanoid_spec().build()


def _standing_clip(n=90, fps=30.0):
    """A clip that stands still at the default pose (trivially trackable)."""
    frames = np.zeros((n, 34), np.float32)
    frames[:, 2] = 0.94
    contacts = np.zeros((n, 15), np.float32)
    contacts[:, [11, 14]] = 1.0  # feet
    terrain = md.HostTerrain(
        hf=np.zeros((32, 32), np.float32),
        min_point=np.asarray([-6.4, -6.4]), dxdy=np.asarray([0.4, 0.4]))
    return md.MotionData(frames=frames, fps=fps, contacts=contacts,
                         terrain=terrain)


@pytest.fixture(scope="module")
def env_and_lib(model):
    cfg = EnvConfig(num_envs=8, rand_root_pos_offset_scale=0.0)
    env = DeepMimicEnv(model, engine.SimParams(), cfg)
    lib = ml.build_motion_lib(model, [_standing_clip()])
    return env, lib


def test_obs_dim_matches_reference(model):
    """Default config must reproduce the reference's 1312-D observation."""
    cfg = EnvConfig()
    env = DeepMimicEnv(model, engine.SimParams(), cfg)
    assert env.obs_dim == 1312, env.obs_layout


def test_reset_shapes(env_and_lib):
    env, lib = env_and_lib
    state = env.reset(lib, jax.random.PRNGKey(0))
    assert state.obs.shape == (8, env.obs_dim)
    assert np.all(np.isfinite(np.asarray(state.obs)))
    # ref-state init: root near the clip pose
    np.testing.assert_allclose(np.asarray(state.sim.root_pos[:, 2]), 0.95,
                               atol=0.05)


def test_rollout_tracks_standing(env_and_lib):
    """Feeding the reference pose as action keeps reward high for a
    standing clip (physics tracks the kinematic target)."""
    env, lib = env_and_lib
    state = env.reset(lib, jax.random.PRNGKey(1))
    actions = jnp.zeros((8, env.action_dim))  # target = default pose
    step = jax.jit(lambda s: env.step(lib, s, actions))
    rewards = []
    for _ in range(15):
        state = step(state)
        rewards.append(np.asarray(state.reward))
    rewards = np.stack(rewards)
    assert np.all(np.isfinite(rewards))
    # standing tracking should earn most of the deepmimic reward
    assert rewards[:10].mean() > 0.5, rewards.mean(axis=1)


def test_bad_actions_terminate(env_and_lib):
    """Wild actions should trigger FAIL terminations and auto-reset."""
    env, lib = env_and_lib
    state = env.reset(lib, jax.random.PRNGKey(2))
    rng = np.random.default_rng(0)
    step = jax.jit(lambda s, a: env.step(lib, s, a))
    saw_fail = False
    for _ in range(40):
        a = jnp.asarray(rng.uniform(-2.5, 2.5, (8, env.action_dim)),
                        jnp.float32)
        state = step(state, a)
        if np.any(np.asarray(state.done) == DoneFlags.FAIL):
            saw_fail = True
    assert saw_fail
    # fail rates should have moved up for the (only) motion
    assert float(state.fail_rates[0]) > 0.5
    # auto-reset keeps the sim finite
    assert np.all(np.isfinite(np.asarray(state.sim.root_pos)))


def test_episode_timeout(model):
    cfg = EnvConfig(num_envs=4, episode_length=0.2,
                    rand_reset=False, enable_early_termination=False)
    env = DeepMimicEnv(model, engine.SimParams(), cfg)
    lib = ml.build_motion_lib(model, [_standing_clip()])
    state = env.reset(lib, jax.random.PRNGKey(3))
    step = jax.jit(lambda s: env.step(lib, s, jnp.zeros((4, env.action_dim))))
    dones = []
    for _ in range(8):
        state = step(state)
        dones.append(np.asarray(state.done))
    assert np.any(np.concatenate(dones) == DoneFlags.TIME)


def test_env_builder():
    """Env construction from config dicts (reference: envs/env_builder.py)."""
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.envs.builder import build_env
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    import pytest as _pytest

    model = humanoid_spec().build()
    env = build_env(model, {"num_envs": 4, "sim": {"control_mode": "pd_exp"}})
    assert env.cfg.num_envs == 4
    assert env.sim_params.control_mode == "pd_exp"
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    env2 = build_env(model, {"env_name": "parkour", "num_envs": 4,
                             "mgdm_num": 2, "terrain_dim": 24}, mdm=mdm)
    assert env2.pcfg.mgdm_num == 2
    with _pytest.raises(KeyError):
        build_env(model, {"env_name": "nope"})
