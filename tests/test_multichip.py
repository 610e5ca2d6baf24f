"""Multi-chip (8 virtual CPU devices) sharding tests.

Two multichip paths exist (CLAUDE.md / engine.control_step docstring):
* GSPMD auto-partitioning — jit over a (data, model) mesh, XLA inserts the
  collectives, but cannot shard a pallas_call (use_pallas=False);
* shard_map over the 'data' axis — per-shard local env batches, the Pallas
  physics kernel stays legal, explicit pmean/psum reductions
  (reference DP contract: learning/mp_optimizer.py:83-90).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import standing_clip, walking_clip
from parc_tpu.envs.base import EnvConfig
from parc_tpu.envs.deepmimic import DeepMimicEnv
from parc_tpu.learning.ppo import PPOAgent, PPOConfig
from parc_tpu.parallel import mesh as mesh_lib
from parc_tpu.physics import engine


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = humanoid_spec().build()
    env = DeepMimicEnv(model, engine.SimParams(), EnvConfig(num_envs=32))
    lib = ml.build_motion_lib(
        model, [standing_clip(), walking_clip(seed=1)])
    agent = PPOAgent(env, PPOConfig(
        steps_per_iter=4, update_epochs=1, batch_size=1,
        actor_net="fc_2layers_512units", critic_net="fc_2layers_512units"))
    state = agent.init(lib, jax.random.PRNGKey(0))
    return agent, lib, state


def test_sharded_train_iter(setup):
    """shard_map train_iter: grads/stats reduce over 'data'; per-shard rng
    streams diverge; fail rates reconcile; global sample count."""
    agent, lib, state = setup
    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    train = mesh_lib.make_sharded_train_iter(agent, mesh, lib, state)
    lib_d = jax.device_put(lib)
    s1, m1 = train(lib_d, state)
    s2, m2 = train(lib_d, s1)
    assert float(s2.sample_count) == 2 * 4 * 32   # psum over shards
    assert np.isfinite(float(m2.mean_reward))
    assert np.isfinite(float(m2.critic_loss))
    # params/normalizer identical across shards (pmean'd grads): pulling
    # them to host must not raise a non-replicated error and be finite
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, s2.params))
    assert all(np.all(np.isfinite(l)) for l in leaves)
    fr = np.asarray(s2.env_state.fail_rates)
    assert fr.shape == (lib.num_motions,) and np.all(np.isfinite(fr))
    # per-shard env rng fold: different shards must have sampled different
    # reset motions / times (motion_times differ across the batch)
    mt = np.asarray(s2.env_state.motion_times)
    assert len(np.unique(np.round(mt, 6))) > 4


def test_sharded_vs_single_iter_shapes(setup):
    """The sharded path returns exactly the single-device pytree shapes."""
    agent, lib, state = setup
    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    train = mesh_lib.make_sharded_train_iter(agent, mesh, lib, state)
    s_sh, m_sh = train(jax.device_put(lib), state)
    ref_shapes = jax.eval_shape(
        lambda l, s: agent.train_iter(l, s, axis_name=None), lib, state)
    got = jax.tree.map(lambda x: x.shape, (s_sh, m_sh))
    want = jax.tree.map(lambda x: x.shape, ref_shapes)
    assert got == want


def test_sharded_rollout(setup):
    agent, lib, state = setup
    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    roll = mesh_lib.make_sharded_rollout(
        agent.env, agent.net, agent.a_mid, agent.a_scale, mesh,
        lib, state.env_state, num_steps=4)
    es, rew = roll(jax.device_put(lib), state.env_state, state.params,
                   state.obs_norm)
    assert np.isfinite(float(rew))
    assert es.obs.shape == state.env_state.obs.shape


def test_check_param_sync():
    """Replicated params pass; per-device drift is caught (reference
    mp_optimizer.py:68-81 desync assertion)."""
    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    params = {"w": jnp.ones((16, 8)), "b": jnp.zeros((8,))}
    dev = mesh_lib.check_param_sync(mesh, params)
    assert dev == 0.0

    # fabricate drifted replicas: stack per-device values that differ
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    def make_drift():
        def local(x):
            idx = jax.lax.axis_index("data").astype(jnp.float32)
            return x + idx * 1e-3
        f = shard_map(local, mesh=mesh, in_specs=(P(),), out_specs=P(),
                      check_vma=False)
        return jax.jit(f)(jnp.ones((16, 8)))

    drifted = {"w": make_drift()}
    with pytest.raises(AssertionError):
        mesh_lib.check_param_sync(mesh, drifted, atol=1e-6)


def test_trainer_multichip_path(setup, tmp_path):
    """pipeline train() routes through shard_map when use_multichip=True:
    2 iterations + a sharded min-episodes test rollout + the desync check
    all run over the 8-device mesh."""
    from parc_tpu.pipeline import train_tracker
    agent, lib, state = setup
    cfg = train_tracker.TrainerConfig(
        output_dir=str(tmp_path), iters_per_output=1,
        iters_per_checkpoint=1000, test_steps=8, test_episodes=8,
        iters_per_sync_check=2, use_multichip=True)
    out = train_tracker.train(agent, lib, cfg, state=state, max_iters=2)
    assert float(out.sample_count) == 2 * 4 * 32
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(out.params)[0])))


# ---------------------------------------------------------------------------
# ParkourEnv under shard_map (per-shard local MDM replan)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def parkour_setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.envs.mgdm import make_platform_terrain
    from parc_tpu.envs.parkour import ParkourConfig, ParkourEnv
    model = humanoid_spec().build()
    lib = ml.build_motion_lib(model, [standing_clip(), walking_clip(seed=1)])
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    mstate = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)
    terrain = make_platform_terrain(np.random.default_rng(0), dim=32)
    env = ParkourEnv(model, engine.SimParams(), EnvConfig(num_envs=16),
                     ParkourConfig(mgdm_num=8, plan_frames=15,
                                   ddim_stride=5), mdm, terrain)
    bundle = env.make_lib(lib, mstate)
    agent = PPOAgent(env, PPOConfig(
        steps_per_iter=2, update_epochs=1, batch_size=1,
        actor_net="fc_2layers_512units", critic_net="fc_2layers_512units"))
    state = agent.init(bundle, jax.random.PRNGKey(0))
    return model, env, bundle, agent, state


def test_parkour_step_parity_shard_vs_single(parkour_setup):
    """One deterministic ParkourEnv step (replan timer parked, no dones):
    8-shard shard_map on the shard-major-permuted state must reproduce the
    single-program step row for row — reward/done/obs parity of the dm AND
    mgdm fractions under the local-env decomposition."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    model, env, bundle, agent, state = parkour_setup
    n_dev = 8
    es = state.env_state.replace(replan_timer=jnp.asarray(1000, jnp.int32))
    act = agent.a_mid + 0.0 * agent.a_scale  # mid actions, deterministic
    act = jnp.broadcast_to(act, (16, env.model.dof_size))

    es_single = env.step(bundle, es, act)

    perm = env.shard_row_permutation(n_dev)
    mesh = mesh_lib.make_mesh(n_dev, model_parallel=1)
    es_perm = mesh_lib.shard_major_env_state(env, es, n_dev)
    local_env = env.local_shard(n_dev)
    spec = mesh_lib.env_state_pspec(es_perm, 16)
    bundle_spec = jax.tree.map(lambda _: P(), bundle)

    def local_fn(b, s, a):
        return local_env.step(b, s, a)

    fn = jax.jit(shard_map(local_fn, mesh=mesh,
                           in_specs=(bundle_spec, spec, P("data")),
                           out_specs=spec, check_vma=False))
    es_shard = fn(bundle, es_perm, act)

    assert not np.any(np.asarray(es_single.done)), "parity setup: no dones"
    np.testing.assert_allclose(np.asarray(es_shard.reward),
                               np.asarray(es_single.reward)[perm],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(es_shard.done),
                                  np.asarray(es_single.done)[perm])
    np.testing.assert_allclose(np.asarray(es_shard.obs),
                               np.asarray(es_single.obs)[perm], atol=2e-4)
    # mgdm buffers carry no env-row permutation (contiguous data blocks)
    np.testing.assert_allclose(np.asarray(es_shard.ref_frames34),
                               np.asarray(es_single.ref_frames34),
                               atol=1e-5)


def test_parkour_sharded_train_iter(parkour_setup):
    """Full PPO train_iter on ParkourEnv under shard_map: per-shard local
    MDM replans fire inside the program, fail rates reconcile, params stay
    replicated, shapes match the single-device path."""
    model, env, bundle, agent, state = parkour_setup
    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    state = state.replace(
        env_state=mesh_lib.shard_major_env_state(env, state.env_state, 8))
    train = mesh_lib.make_sharded_train_iter(agent, mesh, bundle, state)
    bundle_d = jax.device_put(bundle)
    s1, m1 = train(bundle_d, state)
    s2, m2 = train(bundle_d, s1)
    assert float(s2.sample_count) == 2 * 2 * 16
    assert np.isfinite(float(m2.mean_reward))
    assert np.isfinite(float(m2.critic_loss))
    # per-shard replans regenerated every mgdm window (reset rows may be
    # synthetic again, but at least one row must hold a generated window)
    f0 = np.asarray(state.env_state.ref_frames34)
    f2 = np.asarray(s2.env_state.ref_frames34)
    assert f2.shape == f0.shape == (8, 15, 34)
    assert not np.array_equal(f0, f2), "replan must regenerate buffers"
    assert np.all(np.isfinite(f2))
    # params replicated across shards -> host fetch is clean and finite
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, s2.params))
    assert all(np.all(np.isfinite(l)) for l in leaves)
    # shapes match the single-program train_iter exactly
    ref_shapes = jax.eval_shape(
        lambda l, s: agent.train_iter(l, s, axis_name=None), bundle, state)
    got = jax.tree.map(lambda x: x.shape, (s2, m2))
    want = jax.tree.map(lambda x: x.shape, ref_shapes)
    assert got == want


def test_parkour_trainer_multichip_path(parkour_setup, tmp_path):
    """pipeline train() routes ParkourEnv through shard_map (the round-2
    'DeepMimicEnv only' restriction is gone): 2 iterations + sharded test
    rollout + desync check on the 8-device mesh."""
    from parc_tpu.pipeline import train_tracker
    model, env, bundle, agent, state = parkour_setup
    cfg = train_tracker.TrainerConfig(
        output_dir=str(tmp_path), iters_per_output=1,
        iters_per_checkpoint=1000, test_steps=4, test_episodes=8,
        iters_per_sync_check=2, use_multichip=True)
    out = train_tracker.train(agent, bundle, cfg, state=state, max_iters=2)
    assert float(out.sample_count) == 2 * 2 * 16
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(out.params)[0])))


def test_checkpoint_roundtrip_across_envs_and_shards(parkour_setup, tmp_path):
    """A shard-major multichip parkour checkpoint restores into a
    single-program env with a DIFFERENT num_envs and trains — and the
    reverse direction too. persistent_state (learning/ppo.py:83-95)
    excludes per-env transients, so checkpoints must be portable across
    env counts and shard layouts (reference resume semantics:
    learning/base_agent.py:127-163 state_dict + fail_rates)."""
    from parc_tpu.envs.parkour import ParkourConfig, ParkourEnv
    from parc_tpu.learning import ppo as ppo_lib
    from parc_tpu.utils import checkpoint as ckpt_lib
    model, env, bundle, agent, state = parkour_setup

    # --- multichip (shard-major, 16 envs x 8 shards) -> checkpoint ------
    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    sm_state = state.replace(
        env_state=mesh_lib.shard_major_env_state(env, state.env_state, 8))
    train = mesh_lib.make_sharded_train_iter(agent, mesh, bundle, sm_state)
    bundle_d = jax.device_put(bundle)
    sm_state, _ = train(bundle_d, sm_state)
    ck_a = str(tmp_path / "from_multichip")
    ckpt_lib.save(f"{ck_a}/checkpoints", 1,
                  ppo_lib.persistent_state(sm_state))
    saved_count = float(sm_state.sample_count)
    saved_leaf = np.asarray(jax.tree.leaves(sm_state.params)[0])

    # --- restore into a single-program env with a different num_envs ----
    env8 = ParkourEnv(env.model, engine.SimParams(), EnvConfig(num_envs=8),
                      ParkourConfig(mgdm_num=4, plan_frames=15,
                                    ddim_stride=5), env.mdm,
                      env.mgdm_terrain)
    # the ParkourLib bundle (motion lib + MDM weights) carries no per-env
    # state, so the 16-env bundle serves the 8-env program unchanged
    bundle8 = bundle
    agent8 = PPOAgent(env8, PPOConfig(
        steps_per_iter=2, update_epochs=1, batch_size=1,
        actor_net="fc_2layers_512units", critic_net="fc_2layers_512units"))
    fresh8 = agent8.init(bundle8, jax.random.PRNGKey(7))
    restored = ckpt_lib.restore(f"{ck_a}/checkpoints",
                                ppo_lib.persistent_state(fresh8))
    st8 = ppo_lib.merge_persistent(fresh8, restored)
    # the restore really carried the trained params + counters over
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(st8.params)[0]), saved_leaf)
    assert float(st8.sample_count) == saved_count
    st8, m8 = jax.jit(lambda l, s: agent8.train_iter(l, s))(bundle8, st8)
    assert np.isfinite(float(m8.mean_reward))
    assert float(st8.sample_count) == saved_count + 2 * 8

    # --- reverse: single-program checkpoint -> shard-major multichip ----
    ck_b = str(tmp_path / "from_single")
    ckpt_lib.save(f"{ck_b}/checkpoints", 1, ppo_lib.persistent_state(st8))
    fresh16 = agent.init(bundle, jax.random.PRNGKey(9))
    restored_b = ckpt_lib.restore(f"{ck_b}/checkpoints",
                                  ppo_lib.persistent_state(fresh16))
    st16 = ppo_lib.merge_persistent(fresh16, restored_b)
    st16 = st16.replace(
        env_state=mesh_lib.shard_major_env_state(env, st16.env_state, 8))
    train_b = mesh_lib.make_sharded_train_iter(agent, mesh, bundle, st16)
    st16, m16 = train_b(bundle_d, st16)
    assert np.isfinite(float(m16.mean_reward))
    assert float(st16.sample_count) == float(st8.sample_count) + 2 * 16
    fr = np.asarray(st16.env_state.fail_rates)
    assert fr.shape == np.asarray(state.env_state.fail_rates).shape
    assert np.all(np.isfinite(fr))
