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
from parc_tpu.envs.deepmimic import DeepMimicEnv
from parc_tpu.learning import normalizer as norm_lib
from parc_tpu.learning.networks import ActorCritic
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


def make_test_fn(agent: PPOAgent, lib: ml.MotionLib, num_steps: int):
    """Deterministic-policy evaluation rollout (jitted once; ``lib`` and
    ``state`` are jit arguments).

    Returns per-rollout mean reward, episode stats, and the 7 tracking-error
    components (reference: learning/dm_ppo_agent.py:162-219)."""
    del lib  # passed at call time
    env = agent.env

    def test_fn(lib, state: AgentState, rng):
        env_state = env.reset(lib, rng)

        def step_fn(es, _):
            norm_obs = norm_lib.normalize(state.obs_norm, es.obs)
            mean, _ = agent.net.apply(state.params, norm_obs,
                                      method="actor")
            action = agent.a_mid + agent.a_scale * mean
            es = env.step(lib, es, action)
            # terminal_times = pre-reset episode time (es.time is already
            # zeroed for done envs by the in-graph auto-reset)
            out = (es.reward, es.done, es.terminal_times, es.tracking_error)
            return es, out

        _, (rewards, dones, times, terr) = jax.lax.scan(
            step_fn, env_state, None, length=num_steps)
        is_done = dones != DoneFlags.NULL
        num_eps = jnp.sum(is_done)
        ep_len = jnp.sum(jnp.where(is_done, times, 0.0)) / jnp.maximum(
            num_eps, 1)
        fails = jnp.sum(dones == DoneFlags.FAIL)
        return dict(
            mean_reward=jnp.mean(rewards),
            num_eps=num_eps,
            mean_ep_len=ep_len,
            fail_frac=fails / jnp.maximum(num_eps, 1),
            tracking_error=jnp.mean(terr, axis=(0, 1)),
        )

    return jax.jit(test_fn)


def train(agent: PPOAgent, lib: ml.MotionLib,
          cfg: TrainerConfig = TrainerConfig(),
          state: Optional[AgentState] = None,
          seed: int = 0, max_iters: Optional[int] = None) -> AgentState:
    logger = Logger(output_file=f"{cfg.output_dir}/log.tsv",
                    use_wandb=cfg.use_wandb)
    if state is None:
        state = agent.init(lib, jax.random.PRNGKey(seed))
        start_step = ckpt_lib.latest_step(f"{cfg.output_dir}/checkpoints")
        if start_step is not None:
            restored = ckpt_lib.restore(f"{cfg.output_dir}/checkpoints",
                                        ppo_lib.persistent_state(state))
            state = ppo_lib.merge_persistent(state, restored)
            print(f"resumed from checkpoint step {start_step}")

    # NOTE: lib is a jit *argument* (device-resident, reused), never a
    # closure — closed-over device arrays stall lowering on remote TPUs.
    train_iter = jax.jit(lambda l, s: agent.train_iter(l, s))
    test_fn = make_test_fn(agent, lib, cfg.test_steps)
    lib = jax.device_put(lib)

    it = 0
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

        if it % cfg.iters_per_output == 0 or it == 1:
            with timers.phase("test"):
                test = test_fn(lib, state, jax.random.PRNGKey(seed + it))
                profiling.sync(test["mean_reward"])
            logger.log("Iteration", it)
            logger.log("Samples", float(state.sample_count))
            logger.log("Wall_Time", (time.time() - t_start) / 3600.0)
            logger.log("Train_Reward", metrics.mean_reward)
            logger.log("Test_Reward", test["mean_reward"])
            logger.log("Test_Episode_Length", test["mean_ep_len"])
            logger.log("Test_Fail_Frac", test["fail_frac"])
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
            logger.end_iter()

        if it % cfg.iters_per_checkpoint == 0:
            ckpt_lib.save(f"{cfg.output_dir}/checkpoints", it,
                          ppo_lib.persistent_state(state))

    # final checkpoint so downstream stages (record) always find a model,
    # even when training stopped between checkpoint intervals
    if it % cfg.iters_per_checkpoint != 0:
        ckpt_lib.save(f"{cfg.output_dir}/checkpoints", it,
                          ppo_lib.persistent_state(state))
    if timers.summary():
        print("phase timers:\n" + timers.report())
    return state
