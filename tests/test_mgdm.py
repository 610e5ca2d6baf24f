"""MGDM (MDM-in-the-loop) env tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.diffusion.mdm import MDM, MDMConfig
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.synthetic import walking_clip
from parc_tpu.envs.base import EnvConfig
from parc_tpu.envs.mgdm import MGDMConfig, MGDMEnv, make_platform_terrain
from parc_tpu.physics import engine


@pytest.fixture(scope="module")
def setup():
    model = humanoid_spec().build()
    lib = ml.build_motion_lib(model, [walking_clip(seed=0)])
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    mdm_state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)
    terrain = make_platform_terrain(np.random.default_rng(0), dim=32)
    env = MGDMEnv(model, engine.SimParams(), EnvConfig(num_envs=4),
                  MGDMConfig(num_envs=4, ddim_stride=5), mdm, terrain)
    return env, mdm_state


def test_init_and_replan(setup):
    env, mdm_state = setup
    refs = env.init_refs(jax.random.PRNGKey(1), 4)
    assert refs.frames34.shape == (4, env.mcfg.plan_frames, 34)
    refs2 = jax.jit(lambda r, k: env.replan(mdm_state, r, k))(
        refs, jax.random.PRNGKey(2))
    assert refs2.frames34.shape == refs.frames34.shape
    assert np.all(np.isfinite(np.asarray(refs2.frames34)))
    assert np.all(np.asarray(refs2.frame_idx) == 0)


def test_step_cycle_with_replan(setup):
    """Full mgdm loop: steps between synchronized replans stay finite."""
    env, mdm_state = setup
    rng = jax.random.PRNGKey(3)
    refs = env.init_refs(rng, 4)
    sim = env.reset(refs, rng)
    step = jax.jit(lambda s, r, a: env.step(s, r, a))
    replan = jax.jit(lambda ms, r, k: env.replan(ms, r, k))
    actions = jnp.zeros((4, env.model.dof_size))

    for cycle in range(2):
        for _ in range(env.mcfg.plan_frames):
            sim, refs, reward, done = step(sim, refs, actions)
            sim = env.hard_reset_mask(sim, refs, done)
        rng, k = jax.random.split(rng)
        refs = replan(mdm_state, refs, k)
    assert np.all(np.isfinite(np.asarray(sim.root_pos)))
    assert np.all(np.isfinite(np.asarray(reward)))
    assert reward.shape == (4,)
