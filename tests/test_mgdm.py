"""MGDM (MDM-in-the-loop) env tests.

MGDMEnv is a thin alias of ParkourEnv with mgdm_num = num_envs (single
implementation of replan/spawn/target logic); these tests drive the
standalone generated-reference configuration end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.diffusion.mdm import MDM, MDMConfig
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.synthetic import walking_clip
from parc_tpu.envs.base import DoneFlags, EnvConfig
from parc_tpu.envs.mgdm import MGDMConfig, MGDMEnv, make_platform_terrain
from parc_tpu.envs.parkour import ParkourEnv
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
                  MGDMConfig(ddim_stride=5, plan_frames=4), mdm, terrain)
    bundle = env.make_default_lib(mdm_state)
    return env, bundle


def test_mgdm_is_parkour_alias(setup):
    """One implementation: MGDMEnv is ParkourEnv with all envs mgdm."""
    env, bundle = setup
    assert isinstance(env, ParkourEnv)
    assert env.n_dm == 0
    assert env.pcfg.mgdm_num == env.cfg.num_envs


def test_init_and_replan(setup):
    env, bundle = setup
    state = env.reset(bundle, jax.random.PRNGKey(1))
    assert state.ref_frames34.shape == (4, env.pcfg.plan_frames, 34)
    assert np.all(np.isfinite(np.asarray(state.obs)))
    # every env is pinned to the terrain slot
    slot = bundle.lib.num_motions - 1
    assert np.all(np.asarray(state.motion_ids) == slot)


def test_step_cycle_with_replan(setup):
    """Full mgdm loop: the synchronized replan fires inside the jitted
    step (lax.cond on the shared timer) and rewrites the window buffer."""
    env, bundle = setup
    state = env.reset(bundle, jax.random.PRNGKey(3))
    step = jax.jit(lambda b, s, a: env.step(b, s, a))
    actions = jnp.zeros((4, env.model.dof_size))

    frames_before = np.asarray(state.ref_frames34)
    replanned = False
    for _ in range(2 * env.pcfg.plan_frames + 1):
        state = step(bundle, state, actions)
        if not np.allclose(np.asarray(state.ref_frames34), frames_before):
            replanned = True
    assert replanned, "synchronized replan never fired"
    assert np.all(np.isfinite(np.asarray(state.sim.root_pos)))
    assert np.all(np.isfinite(np.asarray(state.reward)))
    assert state.reward.shape == (4,)


def test_oob_termination(setup):
    """OOB-z termination for mgdm rows (reference: mgdm_env.py:159-204)."""
    env, bundle = setup
    state = env.reset(bundle, jax.random.PRNGKey(4))
    # teleport env 0 far below the terrain; step once
    sim = state.sim
    root_pos = sim.root_pos.at[0, 2].add(-50.0)
    state = state.replace(sim=sim.replace(root_pos=root_pos))
    out = env.step(bundle, state, jnp.zeros((4, env.model.dof_size)))
    assert int(out.done[0]) == DoneFlags.FAIL
