"""Tracker training driver (parc_3 stage).

Host loop around the jitted PPO ``train_iter``: periodic deterministic test
rollouts, fail-rate logging, orbax checkpoints.  The reference spreads this
over run.py + BaseAgent.train_model (learning/base_agent.py:57-90,
learning/dm_ppo_agent.py:230-271); here each iteration is one device
program and the host only logs and checkpoints.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.anim import motion_lib as ml
from parc_tpu.envs.base import DoneFlags
from parc_tpu.learning import normalizer as norm_lib
from parc_tpu.learning import ppo as ppo_lib
from parc_tpu.learning.ppo import AgentState, PPOAgent
from parc_tpu.utils import checkpoint as ckpt_lib
from parc_tpu.utils import profiling
from parc_tpu.utils.logger import Logger

TRACKING_ERROR_NAMES = ("root_pos_err", "root_rot_err", "body_pos_err",
                        "pose_err", "dof_vel_err", "root_vel_err",
                        "root_ang_vel_err")


@dataclasses.dataclass
class TrainerConfig:
    max_samples: float = 1e10
    iters_per_output: int = 100
    iters_per_checkpoint: int = 200
    test_episodes: int = 16
    test_steps: int = 300
    output_dir: str = "output/tracker"
    use_wandb: bool = False
    # XLA profiler: capture iterations [profile_start, profile_start +
    # profile_iters) into <output_dir>/profile (TensorBoard / Perfetto)
    profile_iters: int = 0
    profile_start: int = 10
    # multichip: periodic data-parallel param-replica desync assertion
    # (reference: learning/mp_optimizer.py:68-81 checks every 1000 steps)
    iters_per_sync_check: int = 1000
    # shard_map data parallelism over visible devices. None = auto: on for
    # multi-device accelerator backends, off on CPU (the 8-virtual-device
    # test environment would drag every fixture through minutes-long
    # shard_map CPU compiles); True forces it (tests, dryrun).
    use_multichip: Optional[bool] = None


REWARD_COMPONENT_NAMES = ("pose_r", "vel_r", "root_pose_r", "root_vel_r",
                          "key_pos_r", "contact_r")


def best_checkpoint_step(output_dir: str, steps=None) -> Optional[int]:
    """Checkpoint step with the highest logged ``Test_Reward``.

    The fail-rate curriculum concentrates sampling on the hardest clips as
    training progresses, so test reward oscillates late in a run; the final
    checkpoint can land in a dip (the reference records from its latest
    ``model.pt`` and relies on long stable runs).  Downstream stages
    (record/eval) may instead pick the best-tested checkpoint from the
    retained history.

    Reads ``<output_dir>/log.tsv`` (Iteration / Test_Reward columns) and
    scores each retained checkpoint by the most recent test at or before
    its step.  Returns None when no log or no checkpoints exist.
    """
    import csv
    import os

    if steps is None:
        try:
            steps = ckpt_lib.all_steps(f"{output_dir}/checkpoints")
        except Exception:
            return None
    if not steps:
        return None
    log_path = os.path.join(output_dir, "log.tsv")
    if not os.path.exists(log_path):
        return steps[-1]
    tests = []  # (iteration, test_reward), ascending
    with open(log_path) as f:
        for row in csv.DictReader(f, delimiter="\t"):
            try:
                tests.append((float(row["Iteration"]),
                              float(row["Test_Reward"])))
            except (KeyError, ValueError):
                continue
    if not tests:
        return steps[-1]
    best_step, best_r = None, -np.inf
    for s in sorted(steps):
        at_or_before = [r for it, r in tests if it <= s]
        if not at_or_before:
            continue
        r = at_or_before[-1]
        if r >= best_r:  # ties -> later (more-trained) checkpoint
            best_step, best_r = s, r
    return best_step if best_step is not None else steps[-1]


def make_test_fn(agent: PPOAgent, max_steps: int, test_episodes: int = 16,
                 axis_name: Optional[str] = None, n_shards: int = 1):
    """Deterministic-policy evaluation rollout (jitted once; ``lib`` and
    ``state`` are jit arguments).

    Runs until every env has finished at least ceil(test_episodes /
    num_envs) episodes (reference: learning/base_agent.py:328-362 —
    the min-episodes-per-env loop removes the bias toward short episodes
    that a fixed step count has), bounded by ``max_steps``.  Returns
    per-episode return/length, fail fraction, per-reward-component
    episodic returns (reference: learning/return_tracker.py:5-60,
    dm_ppo_return_tracker.py), and the 7 tracking-error components
    (reference: learning/dm_ppo_agent.py:162-219).

    With ``axis_name`` the returned fn is shard_map-ready: pass the PER-
    SHARD agent (parallel/mesh.local_agent — its env.cfg.num_envs is the
    local batch); each shard rolls out its local env slice, the stopping
    decision and all episode statistics reduce over the axis (one global
    report, every chip stops on the same step). The raw fn is returned
    (caller wraps in shard_map+jit); without ``axis_name`` it is jitted
    here.
    """
    env = agent.env
    psum = ((lambda x: jax.lax.psum(x, axis_name)) if axis_name
            else (lambda x: x))

    def test_fn(lib, state: AgentState, rng):
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        es = env.reset(lib, rng, num_envs=env.cfg.num_envs)
        n = es.done.shape[0]
        min_eps = -(-int(test_episodes) // (n * n_shards))   # static ceil
        ncomp = es.reward_components.shape[-1]
        nterr = es.tracking_error.shape[-1]

        carry0 = dict(
            es=es,
            step=jnp.zeros((), jnp.int32),
            all_done=jnp.zeros((), jnp.bool_),
            eps_per_env=jnp.zeros((n,), jnp.int32),
            ret_buf=jnp.zeros((n,)),
            comp_buf=jnp.zeros((n, ncomp)),
            reward_sum=jnp.zeros(()),
            ep_ret_sum=jnp.zeros(()),
            ep_len_sum=jnp.zeros(()),
            ep_cnt=jnp.zeros(()),
            fail_cnt=jnp.zeros(()),
            comp_ret_sum=jnp.zeros((ncomp,)),
            terr_sum=jnp.zeros((nterr,)),
        )

        def cond(c):
            # all_done is reduced over the data axis in the body, so every
            # shard evaluates the same condition (no cross-shard divergence
            # inside shard_map's per-device while loops)
            return (c["step"] < max_steps) & ~c["all_done"]

        def body(c):
            es = c["es"]
            norm_obs = norm_lib.normalize(state.obs_norm, es.obs)
            mean, _ = agent.net.apply(state.params, norm_obs,
                                      method="actor")
            action = agent.a_mid + agent.a_scale * mean
            es = env.step(lib, es, action)
            is_done = es.done != DoneFlags.NULL
            d = is_done.astype(jnp.float32)
            # per-env episodic accumulators (reset on done)
            ret_buf = c["ret_buf"] + es.reward
            comp_buf = c["comp_buf"] + es.reward_components
            eps_per_env = c["eps_per_env"] + is_done.astype(jnp.int32)
            local_done = jnp.all(eps_per_env >= min_eps)
            return dict(
                es=es,
                step=c["step"] + 1,
                all_done=(psum(local_done.astype(jnp.int32))
                          >= n_shards) if axis_name else local_done,
                eps_per_env=eps_per_env,
                ret_buf=jnp.where(is_done, 0.0, ret_buf),
                comp_buf=jnp.where(is_done[:, None], 0.0, comp_buf),
                reward_sum=c["reward_sum"] + jnp.sum(es.reward),
                ep_ret_sum=c["ep_ret_sum"] + jnp.sum(d * ret_buf),
                # terminal_times = pre-reset episode time (es.time is
                # already zeroed for done envs by the in-graph auto-reset)
                ep_len_sum=c["ep_len_sum"] + jnp.sum(d * es.terminal_times),
                ep_cnt=c["ep_cnt"] + jnp.sum(d),
                fail_cnt=c["fail_cnt"]
                + jnp.sum((es.done == DoneFlags.FAIL).astype(jnp.float32)),
                comp_ret_sum=c["comp_ret_sum"]
                + jnp.sum(d[:, None] * comp_buf, axis=0),
                terr_sum=c["terr_sum"] + jnp.sum(es.tracking_error, axis=0),
            )

        c = jax.lax.while_loop(cond, body, carry0)
        steps = jnp.maximum(c["step"].astype(jnp.float32), 1.0)
        ep_cnt = psum(c["ep_cnt"])
        eps = jnp.maximum(ep_cnt, 1.0)
        n_total = n * n_shards
        return dict(
            mean_reward=psum(c["reward_sum"]) / (steps * n_total),
            mean_return=psum(c["ep_ret_sum"]) / eps,
            num_eps=ep_cnt,
            mean_ep_len=psum(c["ep_len_sum"]) / eps,
            fail_frac=psum(c["fail_cnt"]) / eps,
            component_returns=psum(c["comp_ret_sum"]) / eps,
            tracking_error=psum(c["terr_sum"]) / (steps * n_total),
            test_steps=c["step"],
        )

    return test_fn if axis_name is not None else jax.jit(test_fn)


def log_fail_rate_tables(logger: Logger, fail_rates: np.ndarray,
                         meta: Optional[dict], top_k: int = 40) -> None:
    """Per-motion top-K fail-rate table + per-class mean/max rates
    (reference: envs/ig_parkour/dm_env.py:786-845 get_extra_log_info)."""
    fr = np.asarray(fail_rates)
    names = list((meta or {}).get("names") or [])
    # envs can append extra slots (e.g. the parkour mgdm terrain slot) —
    # pad names/classes to the fail-rate length
    names += [f"motion_{i}" for i in range(len(names), len(fr))]
    classes = (meta or {}).get("classes")
    if classes is not None:
        classes = list(classes) + ["_extra"] * (len(fr) - len(classes))
    k = min(top_k, len(fr))
    order = np.argsort(-fr)[:k]
    print(f"***** TOP {k} FAILURE RATES BY MOTION ID *****")
    for i in order:
        print(f"  {names[i]:<40s} id={i:<5d} fail rate (EMA): "
              f"{fr[i] * 100.0:.1f}%")
    if classes is not None:
        for cls in sorted(set(classes)):
            ids = [i for i, c in enumerate(classes) if c == cls]
            logger.log(f"{cls}_mean_fail_rate",
                       float(np.mean(fr[ids]) * 100.0), quiet=True)
            logger.log(f"{cls}_max_fail_rate",
                       float(np.max(fr[ids]) * 100.0), quiet=True)


def train(agent: PPOAgent, lib: ml.MotionLib,
          cfg: TrainerConfig = TrainerConfig(),
          state: Optional[AgentState] = None,
          seed: int = 0, max_iters: Optional[int] = None,
          meta: Optional[dict] = None) -> AgentState:
    logger = Logger(output_file=f"{cfg.output_dir}/log.tsv",
                    use_wandb=cfg.use_wandb)
    it0 = 0
    if state is None:
        state = agent.init(lib, jax.random.PRNGKey(seed))
        start_step = ckpt_lib.latest_step(f"{cfg.output_dir}/checkpoints")
        if start_step is not None:
            restored = ckpt_lib.restore(f"{cfg.output_dir}/checkpoints",
                                        ppo_lib.persistent_state(state))
            state = ppo_lib.merge_persistent(state, restored)
            # resume the iteration counter too: re-invoking a finished
            # run with the same max_iters is then a no-op instead of a
            # second full training budget (ADVICE r4)
            it0 = start_step
            print(f"resumed from checkpoint step {start_step}")

    # NOTE: lib is a jit *argument* (device-resident, reused), never a
    # closure — closed-over device arrays stall lowering on remote TPUs.
    n_dev = len(jax.devices())
    num_envs = agent.env.cfg.num_envs
    mesh = None
    multichip = cfg.use_multichip
    if multichip is None:
        multichip = jax.default_backend() != "cpu"
    mgdm_num = getattr(getattr(agent.env, "pcfg", None), "mgdm_num", 0)
    divisible = num_envs % n_dev == 0 and mgdm_num % n_dev == 0
    if multichip and n_dev > 1 and not divisible:
        print(f"WARNING: num_envs {num_envs} / mgdm_num {mgdm_num} not "
              f"divisible by {n_dev} devices; training single-program")
    if multichip and n_dev > 1 and divisible:
        # multichip: shard_map data parallelism over the env batch — keeps
        # the Pallas physics kernel legal (one local batch per chip; GSPMD
        # cannot auto-shard a pallas_call). Gradients/normalizer/advantage
        # moments psum over 'data' inside train_iter; test rollouts reduce
        # their episode statistics the same way.  ParkourEnv/MGDMEnv shard
        # too: each chip runs a local dm|mgdm slice with its own in-graph
        # MDM replan (parallel/mesh.py make_sharded_train_iter).
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P
        from parc_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(n_dev, model_parallel=1)
        state = state.replace(env_state=mesh_lib.shard_major_env_state(
            agent.env, state.env_state, n_dev))
        train_iter = mesh_lib.make_sharded_train_iter(agent, mesh, lib,
                                                      state)
        test_core = make_test_fn(mesh_lib.local_agent(agent, n_dev),
                                 cfg.test_steps, cfg.test_episodes,
                                 axis_name="data", n_shards=n_dev)
        state_spec = mesh_lib.agent_state_pspec(state, num_envs)
        lib_spec = jax.tree.map(lambda _: P(), lib)
        test_fn = jax.jit(shard_map(
            test_core, mesh=mesh,
            in_specs=(lib_spec, state_spec, P()), out_specs=P(),
            check_vma=False))
        lib = jax.device_put(
            lib, jax.tree.map(lambda _: NamedSharding(mesh, P()), lib))
        state = state.replace(env_state=jax.device_put(
            state.env_state,
            mesh_lib.env_state_shardings(mesh, state.env_state, num_envs)))
        print(f"multichip: shard_map DP over {n_dev} devices "
              f"({num_envs // n_dev} envs/chip"
              + (f", {mgdm_num // n_dev} mgdm/chip" if mgdm_num else "")
              + ")")
    else:
        train_iter = jax.jit(lambda l, s: agent.train_iter(l, s))
        test_fn = make_test_fn(agent, cfg.test_steps, cfg.test_episodes)
        lib = jax.device_put(lib)

    it = it0
    t_start = time.time()
    timers = profiling.PhaseTimer()
    while float(state.sample_count) < cfg.max_samples:
        if max_iters is not None and it >= max_iters:
            break
        if cfg.profile_iters and it == cfg.profile_start:
            jax.profiler.start_trace(f"{cfg.output_dir}/profile")
        t0 = time.time()
        with timers.phase("train_iter"):
            new_state, metrics = train_iter(lib, state)
            profiling.sync(metrics.mean_reward)
        iter_time = time.time() - t0
        it += 1
        if (cfg.profile_iters
                and it == cfg.profile_start + cfg.profile_iters):
            jax.profiler.stop_trace()
            print(f"profile trace written to {cfg.output_dir}/profile")

        # NaN guard + debug dump (reference: ppo_agent.py:242-252 dumps the
        # offending batch to output/debug_batch.pkl and exits)
        critic_loss = float(metrics.critic_loss)
        if not np.isfinite(critic_loss) or not np.isfinite(
                float(metrics.mean_reward)):
            import pickle
            dump = f"{cfg.output_dir}/debug_state.pkl"
            with open(dump, "wb") as f:
                pickle.dump(jax.tree.map(np.asarray,
                                         ppo_lib.persistent_state(state)), f)
            raise FloatingPointError(
                f"non-finite training metrics at iter {it} "
                f"(critic_loss={critic_loss}); pre-update state dumped to "
                f"{dump}")
        state = new_state

        if (mesh is not None and cfg.iters_per_sync_check
                and it % cfg.iters_per_sync_check == 0):
            from parc_tpu.parallel import mesh as mesh_lib
            mesh_lib.check_param_sync(mesh, state.params)

        if it % cfg.iters_per_output == 0 or it == 1:
            with timers.phase("test"):
                test = test_fn(lib, state, jax.random.PRNGKey(seed + it))
                profiling.sync(test["mean_reward"])
            logger.log("Iteration", it)
            logger.log("Samples", float(state.sample_count))
            logger.log("Wall_Time", (time.time() - t_start) / 3600.0)
            logger.log("Train_Reward", metrics.mean_reward)
            logger.log("Test_Reward", test["mean_reward"])
            logger.log("Test_Return", test["mean_return"])
            logger.log("Test_Episodes", test["num_eps"], quiet=True)
            logger.log("Test_Episode_Length", test["mean_ep_len"])
            logger.log("Test_Fail_Frac", test["fail_frac"])
            comp = np.asarray(test["component_returns"])
            for name, v in zip(REWARD_COMPONENT_NAMES, comp):
                logger.log(f"Return_{name}", float(v), quiet=True)
            logger.log("Actor_Loss", metrics.actor_loss)
            logger.log("Critic_Loss", metrics.critic_loss)
            logger.log("Clip_Frac", metrics.clip_frac)
            logger.log("Samples_Per_Sec",
                       agent.cfg.steps_per_iter
                       * agent.env.cfg.num_envs / iter_time)
            terr = np.asarray(test["tracking_error"])
            for name, v in zip(TRACKING_ERROR_NAMES, terr):
                logger.log(name, v, quiet=True)
            fr = np.asarray(state.env_state.fail_rates)
            for q in (0.5, 0.9, 0.99):
                logger.log(f"Fail_Rate_q{q}", float(np.quantile(fr, q)),
                           quiet=True)
            log_fail_rate_tables(logger, fr, meta, top_k=10)
            logger.end_iter()

        if it % cfg.iters_per_checkpoint == 0:
            ckpt_lib.save(f"{cfg.output_dir}/checkpoints", it,
                          ppo_lib.persistent_state(state))

    # final checkpoint so downstream stages (record) always find a model,
    # even when training stopped between checkpoint intervals
    if it != it0 and it % cfg.iters_per_checkpoint != 0:
        ckpt_lib.save(f"{cfg.output_dir}/checkpoints", it,
                          ppo_lib.persistent_state(state))
    if timers.summary():
        print("phase timers:\n" + timers.report())
    return state
