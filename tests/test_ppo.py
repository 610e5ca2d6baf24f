"""PPO agent tests: TD(lambda) oracle, train_iter smoke, determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.envs.base import DoneFlags, EnvConfig
from parc_tpu.envs.deepmimic import DeepMimicEnv
from parc_tpu.learning import rl_util
from parc_tpu.learning.ppo import PPOAgent, PPOConfig
from parc_tpu.physics import engine


def _brute_force_td_lambda(r, next_vals, done, discount, td_lambda):
    """Independent oracle: lambda-weighted mixture of n-step returns,
    truncated at the first done (which bootstraps through next_vals).

    G^(n)_t = sum_{k<n} g^k r_{t+k} + g^n V_{t+n}  with V_{t+n} read from
    next_vals[t+n-1]; G^lam_t = (1-lam) sum_{n<L} lam^(n-1) G^(n)_t
    + lam^(L-1) G^(L)_t where L is the steps until the cut.
    """
    T, B = r.shape
    out = np.zeros_like(r)
    for b in range(B):
        for t in range(T):
            # find cut: first step m >= t that is done (or the batch end)
            m = t
            while m < T - 1 and done[m, b] == DoneFlags.NULL:
                m += 1
            L = m - t + 1
            total = 0.0
            for n in range(1, L + 1):
                g_n = sum(discount ** k * r[t + k, b] for k in range(n))
                g_n += discount ** n * next_vals[t + n - 1, b]
                w = (td_lambda ** (n - 1) if n == L
                     else (1 - td_lambda) * td_lambda ** (n - 1))
                total += w * g_n
            out[t, b] = total
    return out


def test_td_lambda_vs_oracle():
    rng = np.random.default_rng(0)
    T, B = 8, 3
    r = rng.uniform(0, 1, (T, B)).astype(np.float32)
    nv = rng.uniform(0, 5, (T, B)).astype(np.float32)
    done = np.zeros((T, B), np.int32)
    done[3, 0] = DoneFlags.FAIL
    done[5, 2] = DoneFlags.TIME
    got = np.asarray(rl_util.compute_td_lambda_return(
        jnp.asarray(r), jnp.asarray(nv), jnp.asarray(done), 0.99, 0.95))
    want = _brute_force_td_lambda(r, nv, done, 0.99, 0.95)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


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


@pytest.fixture(scope="module")
def setup():
    model = humanoid_spec().build()
    cfg = EnvConfig(num_envs=8)
    env = DeepMimicEnv(model, engine.SimParams(), cfg)
    lib = ml.build_motion_lib(model, [_standing_clip()])
    ppo_cfg = PPOConfig(steps_per_iter=8, update_epochs=2, batch_size=4,
                        actor_net="fc_2layers_512units",
                        critic_net="fc_2layers_512units")
    agent = PPOAgent(env, ppo_cfg)
    return env, lib, agent


def test_train_iter_runs_and_updates(setup):
    env, lib, agent = setup
    state = agent.init(lib, jax.random.PRNGKey(0))
    train = jax.jit(lambda s: agent.train_iter(lib, s))
    new_state, metrics = train(state)
    # parameters moved
    delta = jax.tree.reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a - b, new_state.params, state.params), 0.0)
    assert delta > 0.0
    assert np.isfinite(float(metrics.mean_reward))
    assert np.isfinite(float(metrics.critic_loss))
    assert float(new_state.sample_count) == 8 * 8
    # normalizer saw the data
    assert float(new_state.obs_norm.count) == 8 * 8

    # second iter: stays finite
    s2, m2 = train(new_state)
    assert np.isfinite(float(m2.mean_reward))
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(s2.params)[0])))


def test_train_iter_deterministic(setup):
    env, lib, agent = setup
    state = agent.init(lib, jax.random.PRNGKey(1))
    train = jax.jit(lambda s: agent.train_iter(lib, s))
    s1, m1 = train(state)
    s2, m2 = train(state)
    np.testing.assert_array_equal(np.asarray(m1.mean_reward),
                                  np.asarray(m2.mean_reward))
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_act_deterministic_mode(setup):
    env, lib, agent = setup
    state = agent.init(lib, jax.random.PRNGKey(2))
    obs = state.env_state.obs
    a1 = agent.act(state, obs, deterministic=True)
    a2 = agent.act(state, obs, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert a1.shape == (8, env.action_dim)


@pytest.mark.parametrize("net", ["dm_cnn_mlp", "dm_vit"])
def test_vision_policies(setup, net):
    """dm_cnn_mlp / dm_vit tracker policies (reference: learning/nets/
    dm_cnn_mlp.py:31-95, dm_vit.py:30-175) init and act on the env obs."""
    env, lib, _ = setup
    cfg = PPOConfig(steps_per_iter=4, update_epochs=1, batch_size=2,
                    actor_net=net)
    agent = PPOAgent(env, cfg)
    state = agent.init(lib, jax.random.PRNGKey(3))
    a = agent.act(state, state.env_state.obs, deterministic=True)
    assert a.shape == (8, env.action_dim)
    assert np.all(np.isfinite(np.asarray(a)))
    train = jax.jit(lambda s: agent.train_iter(lib, s))
    new_state, metrics = train(state)
    assert np.isfinite(float(metrics.mean_reward))
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(new_state.params)[0])))


def test_network_diagnostics(setup):
    """Dormant units + stable rank (reference: dm_ppo_agent.test_model2)."""
    from parc_tpu.learning import diagnostics
    env, lib, agent = setup
    state = agent.init(lib, jax.random.PRNGKey(4))
    report = diagnostics.full_report(agent, state, state.env_state.obs)
    w = report["weights"]
    assert len(w) >= 4  # trunk layers + heads
    for name, d in w.items():
        assert 1 <= d["stable_rank"] <= d["max_rank"], name
        assert d["mean_abs_weight"] > 0
    acts = report["activations"]
    assert acts
    for name, d in acts.items():
        assert 0.0 <= d["dormant_frac"] <= 1.0
    # a rank-1 matrix has stable rank 1
    w1 = np.outer(np.ones(8), np.arange(1, 9.0))
    assert diagnostics.stable_rank(w1) == 1
    # identity has full stable rank (99% mass needs 99% of values)
    assert diagnostics.stable_rank(np.eye(100)) == 99


def test_reset_pool_distribution_under_heavy_reuse():
    """ResetPool semantic drift bound (envs/deepmimic.py:49-54): with
    1-second clips every env resets far more than k=4 times per rollout,
    so pool entries are reused.  Entries are i.i.d. draws from the
    fail-rate-weighted reset distribution, so the AGGREGATE motion-id
    frequency over all reset events must still match
    w = lib.weights * (min_motion_weight + fail_rates) (reference
    curriculum: envs/ig_parkour/dm_env.py:517-568) — reuse may reduce
    per-env diversity but must not skew the start-state distribution."""
    model = humanoid_spec().build()
    n_envs, T, k = 256, 64, 4
    # 4 very short standing clips (0.27 s = 8 frames): TIME done at clip
    # end; rand_reset start times make the mean episode ~4 control steps,
    # so every env resets ~2-4x the pool depth k within one rollout
    clips = [_standing_clip(n=8) for _ in range(4)]
    lib = ml.build_motion_lib(model, clips)
    env = DeepMimicEnv(model, engine.SimParams(),
                       EnvConfig(num_envs=n_envs))
    agent = PPOAgent(env, PPOConfig(
        steps_per_iter=T, reset_pool_k=k,
        actor_net="fc_2layers_512units", critic_net="fc_2layers_512units"))
    state = agent.init(lib, jax.random.PRNGKey(0))
    fail_rates = jnp.asarray([0.9, 0.4, 0.1, 0.02])
    state = state.replace(env_state=state.env_state.replace(
        fail_rates=fail_rates))

    _, _, batch = jax.jit(
        lambda s: agent.rollout(lib, s, exp_prob=jnp.asarray(1.0)))(state)
    done = np.asarray(batch["done"])              # [T, B]
    assert done.shape == (T, n_envs)
    resets_per_env = (done != DoneFlags.NULL).sum(axis=0)
    assert resets_per_env.min() >= 2 * k, (
        f"test needs heavy reuse, got min {resets_per_env.min()} resets")

    # re-simulate the id stream: pool draws are what the rollout consumed;
    # rebuild the pool with the same rng path to read motion ids per event
    pool_rng = jax.random.split(state.rng)[1]
    pool = env.build_reset_pool(lib, pool_rng, fail_rates, n_envs, k=k)
    pool_ids = np.asarray(pool.motion_ids).reshape(k, n_envs)
    counts = np.zeros(lib.num_motions)
    slot = np.zeros(n_envs, np.int64)
    for t in range(T):
        d = done[t] != DoneFlags.NULL
        ids_t = pool_ids[slot[d] % k, np.where(d)[0]]
        np.add.at(counts, ids_t, 1)
        slot[d] += 1

    freq = counts / counts.sum()
    w = np.asarray(lib.weights) * (env.cfg.min_motion_weight
                                   + np.asarray(fail_rates))
    want = w / w.sum()
    # pool has k*n = 1024 i.i.d. draws; reuse correlates events, so allow
    # ~4 sigma of the pool-level multinomial noise
    tol = 4.0 * np.sqrt(want * (1 - want) / (k * n_envs)) + 0.01
    assert np.all(np.abs(freq - want) < tol), (freq, want, tol)
