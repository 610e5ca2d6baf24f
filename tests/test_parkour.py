"""Parkour composition env: dm + mgdm env fractions in one jitted program
(reference: envs/ig_parkour/ig_parkour_env.py + mgdm_env.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import standing_clip, walking_clip
from parc_tpu.diffusion.mdm import MDM, MDMConfig
from parc_tpu.envs.base import DoneFlags, EnvConfig
from parc_tpu.envs.mgdm import make_platform_terrain
from parc_tpu.envs.parkour import ParkourConfig, ParkourEnv
from parc_tpu.physics import engine


@pytest.fixture(scope="module")
def setup():
    model = humanoid_spec().build()
    lib = ml.build_motion_lib(model,
                              [standing_clip(), walking_clip(seed=1)])
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    mstate = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)
    terrain = make_platform_terrain(np.random.default_rng(0), dim=32)
    env = ParkourEnv(model, engine.SimParams(), EnvConfig(num_envs=6),
                     ParkourConfig(mgdm_num=2, plan_frames=15,
                                   ddim_stride=5), mdm, terrain)
    bundle = env.make_lib(lib, mstate)
    return model, env, bundle


def test_reset_pins_mgdm_rows(setup):
    model, env, bundle = setup
    es = env.reset(bundle, jax.random.PRNGKey(1))
    ids = np.asarray(es.motion_ids)
    slot = bundle.lib.num_motions - 1
    # last 2 rows pinned to the terrain slot; dm rows sample real motions
    assert np.all(ids[-2:] == slot)
    assert np.all(ids[:-2] < slot - 0)
    assert es.obs.shape == (6, env.obs_dim)
    assert np.all(np.isfinite(np.asarray(es.obs)))
    # mgdm rows spawn on the procgen terrain (within bounds)
    root = np.asarray(es.sim.root_pos[-2:])
    t = env.mgdm_terrain
    assert np.all(root[:, 0:2] >= t.min_point - 1e-3)
    assert np.all(root[:, 0:2] <= np.asarray(t.max_point) + 1e-3)


def test_step_replans_and_tracks(setup):
    model, env, bundle = setup
    es = env.reset(bundle, jax.random.PRNGKey(2))
    step = jax.jit(lambda b, s, a: env.step(b, s, a))
    a = jnp.zeros((6, model.dof_size))
    f0 = np.asarray(es.ref_frames34)
    es = step(bundle, es, a)   # timer==1 -> replan fires
    f1 = np.asarray(es.ref_frames34)
    assert not np.array_equal(f0, f1), "replan must regenerate the buffer"
    assert int(es.replan_timer) == 15
    for _ in range(3):
        es = step(bundle, es, a)
    assert np.all(np.isfinite(np.asarray(es.obs)))
    assert np.all(np.isfinite(np.asarray(es.reward)))
    # mgdm rows never time out on the dummy slot length
    mg_done = np.asarray(es.done)[-2:]
    assert np.all((mg_done == DoneFlags.NULL) | (mg_done == DoneFlags.FAIL))


def test_ppo_trains_on_parkour(setup):
    from parc_tpu.learning.ppo import PPOAgent, PPOConfig
    model, env, bundle = setup
    agent = PPOAgent(env, PPOConfig(
        steps_per_iter=4, update_epochs=1, batch_size=1,
        actor_net="fc_2layers_512units", critic_net="fc_2layers_512units"))
    state = agent.init(bundle, jax.random.PRNGKey(3))
    new_state, metrics = jax.jit(
        lambda b, s: agent.train_iter(b, s))(bundle, state)
    assert np.isfinite(float(metrics.mean_reward))
    assert np.all(np.isfinite(
        np.asarray(jax.tree.leaves(new_state.params)[0])))
