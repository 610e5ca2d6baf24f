"""PPO agent with a single jitted train iteration.

One ``train_iter`` = rollout scan (steps_per_iter control steps over all
envs) + TD(lambda) targets + minibatch-epoch updates — the entire loop the
reference spreads over host Python (learning/base_agent.py:57-90,
ppo_agent.py:87-330) compiles to one SPMD program.  Data parallelism over a
device mesh drops in by wrapping ``train_iter`` in shard_map and passing
``axis_name`` — gradients and normalizer stats are ``pmean``/``psum``-reduced
over ICI (replaces MPOptimizer's NCCL allreduce,
learning/mp_optimizer.py:83-90).

Hyperparameter defaults follow PARC/tracker_config/dm_agent_default.yaml.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from parc_tpu.envs.base import DoneFlags, EnvState
from parc_tpu.learning import distributions as dist
from parc_tpu.learning import normalizer as norm_lib
from parc_tpu.learning import rl_util
from parc_tpu.learning.networks import ActorCritic


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    steps_per_iter: int = 32
    # reset-pool depth: done envs pull pre-sampled reset states/obs from a
    # pool built once per iteration (k full batches) instead of paying a
    # second full obs pass every step (envs/deepmimic.py ResetPool).
    # 0 = inline resets (two obs passes, round-1 behavior).
    reset_pool_k: int = 4
    discount: float = 0.99
    td_lambda: float = 0.95
    ppo_clip_ratio: float = 0.2
    update_epochs: int = 5
    batch_size: int = 4               # minibatch = batch_size * num_envs
    critic_loss_weight: float = 10.0
    critic_loss_guard: float = 20.0  # actor grads cut above this
    action_bound_weight: float = 10.0
    action_entropy_weight: float = 0.0
    norm_adv_clip: float = 4.0
    norm_obs_clip: float = 10.0
    normalizer_samples: float = 3e8
    learning_rate: float = 5e-5
    momentum: float = 0.9
    clip_grad_norm: Optional[float] = 1000.0
    exp_prob_beg: float = 1.0
    exp_prob_end: float = 1.0
    exp_anneal_samples: float = float("inf")
    reward_succ: float = 1.0
    reward_fail: float = 0.0
    reward_min: float = 0.0
    reward_max: float = 1.0

    actor_net: str = "fc_3layers_2048units"
    critic_net: str = "fc_3layers_2048units"
    # bf16 trunk matmuls on accelerator backends (params/heads/losses stay
    # f32, CPU stays full f32) — same policy as MDMConfig.bf16_compute
    bf16_compute: bool = True
    actor_std_type: str = "FIXED"
    action_std: float = 0.05
    actor_init_output_scale: float = 0.01


@struct.dataclass
class AgentState:
    params: Any
    opt_state: Any
    obs_norm: norm_lib.NormalizerState
    env_state: EnvState
    rng: jax.Array
    sample_count: jax.Array  # ()


def persistent_state(state: AgentState) -> dict:
    """Checkpointable sub-pytree: model/optimizer/normalizer + per-motion
    fail rates. Per-env transients (sim state, obs buffers) are excluded so
    a checkpoint restores into any ``num_envs`` (reference checkpoints
    state_dict + fail_rates.pt: learning/base_agent.py:127-163,
    dm_ppo_agent.py:775-781)."""
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "obs_norm": state.obs_norm,
        "sample_count": state.sample_count,
        "fail_rates": state.env_state.fail_rates,
    }


def merge_persistent(state: AgentState, restored: dict) -> AgentState:
    """Inverse of :func:`persistent_state` against a fresh init."""
    return state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        obs_norm=restored["obs_norm"],
        sample_count=restored["sample_count"],
        env_state=state.env_state.replace(
            fail_rates=restored["fail_rates"]),
    )


@struct.dataclass
class TrainMetrics:
    mean_reward: jax.Array
    mean_return_done: jax.Array   # mean episodic proxy: reward over batch
    actor_loss: jax.Array
    critic_loss: jax.Array
    bound_loss: jax.Array
    clip_frac: jax.Array
    adv_mean: jax.Array
    adv_std: jax.Array
    num_dones: jax.Array
    num_fails: jax.Array
    mean_ep_time: jax.Array
    tracking_error: jax.Array     # (7,)


class PPOAgent:
    """Holds static config + network; all state lives in AgentState."""

    def __init__(self, env, cfg: PPOConfig = PPOConfig()):
        self.env = env
        self.cfg = cfg
        compute_dtype = (jnp.bfloat16 if cfg.bf16_compute
                         and jax.default_backend() != "cpu" else None)
        if cfg.actor_net in ("dm_cnn_mlp", "dm_vit"):
            from parc_tpu.learning import vision_nets
            from parc_tpu.envs import perception
            hf_shape = perception.hf_shape(env.cfg)
            cls = (vision_nets.DMCnnMlp if cfg.actor_net == "dm_cnn_mlp"
                   else vision_nets.DMViT)
            self.net = cls(action_dim=env.action_dim,
                           layout=env.obs_layout, hf_shape=hf_shape,
                           action_std=cfg.action_std,
                           actor_init_output_scale=cfg.actor_init_output_scale,
                           dtype=compute_dtype)
        else:
            self.net = ActorCritic(
                action_dim=env.action_dim,
                actor_net=cfg.actor_net, critic_net=cfg.critic_net,
                actor_std_type=cfg.actor_std_type, action_std=cfg.action_std,
                actor_init_output_scale=cfg.actor_init_output_scale,
                dtype=compute_dtype)
        lo, hi = env.action_bounds()
        self.a_mid = (hi + lo) / 2.0
        self.a_scale = (hi - lo) / 2.0
        tx = optax.sgd(cfg.learning_rate, momentum=cfg.momentum)
        if cfg.clip_grad_norm:
            tx = optax.chain(optax.clip_by_global_norm(cfg.clip_grad_norm), tx)
        self.tx = tx

    # ------------------------------------------------------------------
    def init(self, lib, rng: jax.Array) -> AgentState:
        k_net, k_env, k_st = jax.random.split(rng, 3)
        obs_dim = self.env.obs_dim
        params = self.net.init(k_net, jnp.zeros((1, obs_dim)))
        env_state = self.env.reset(lib, k_env)
        norm_mask = (~self.env.obs_layout.non_norm_mask()).astype(jnp.float32)
        obs_norm = norm_lib.create(
            obs_dim, norm_mask, clip=self.cfg.norm_obs_clip,
            sample_limit=self.cfg.normalizer_samples)
        return AgentState(
            params=params, opt_state=self.tx.init(params),
            obs_norm=obs_norm, env_state=env_state, rng=k_st,
            sample_count=jnp.zeros(()))

    # ------------------------------------------------------------------
    def _action_from_norm(self, norm_a):
        return self.a_mid + self.a_scale * norm_a

    def act(self, agent: AgentState, obs, rng=None, deterministic=True):
        """Single-step policy evaluation (testing / recording)."""
        norm_obs = norm_lib.normalize(agent.obs_norm, obs)
        mean, logstd = self.net.apply(agent.params, norm_obs,
                                      method="actor")
        if deterministic or rng is None:
            norm_a = mean
        else:
            norm_a = dist.sample(rng, mean, logstd)
        return self._action_from_norm(norm_a)

    # ------------------------------------------------------------------
    def rollout(self, lib, agent: AgentState,
                exp_prob: jax.Array):
        """Collect steps_per_iter transitions; returns batch dict [T, B]."""
        pool = None
        pool_k = self.cfg.reset_pool_k
        rng0 = agent.rng
        n = agent.env_state.done.shape[0]
        if pool_k > 0 and hasattr(self.env, "build_reset_pool"):
            rng0, k_pool = jax.random.split(rng0)
            pool = self.env.build_reset_pool(
                lib, k_pool, agent.env_state.fail_rates, n, k=pool_k)

        def step_fn(carry, _):
            env_state, rng, reset_counts = carry
            rng, k_s, k_m = jax.random.split(rng, 3)
            obs = env_state.obs
            norm_obs = norm_lib.normalize(agent.obs_norm, obs)
            mean, logstd = self.net.apply(agent.params, norm_obs,
                                          method="actor")
            a_rand = dist.sample(k_s, mean, logstd)
            rand_mask = (jax.random.uniform(k_m, mean.shape[:-1])
                         < exp_prob).astype(jnp.float32)
            norm_a = jnp.where(rand_mask[..., None] > 0, a_rand, mean)
            logp = dist.log_prob(mean, logstd, norm_a)
            action = self._action_from_norm(norm_a)

            if pool is not None:
                new_env_state = self.env.step(
                    lib, env_state, action, reset_pool=pool,
                    pool_slot=reset_counts % pool_k)
                reset_counts = reset_counts + (
                    new_env_state.done != DoneFlags.NULL).astype(jnp.int32)
            else:
                new_env_state = self.env.step(lib, env_state, action)
            trans = {
                "obs": obs,
                "norm_a": norm_a,
                "logp": logp,
                "rand_mask": rand_mask,
                "reward": new_env_state.reward,
                "done": new_env_state.done,
                "next_obs": new_env_state.terminal_obs,
                "ep_time": new_env_state.terminal_times,
                "tracking_error": new_env_state.tracking_error,
            }
            return (new_env_state, rng, reset_counts), trans

        (env_state, rng, _), batch = jax.lax.scan(
            step_fn, (agent.env_state, rng0, jnp.zeros((n,), jnp.int32)),
            None, length=self.cfg.steps_per_iter)
        return env_state, rng, batch

    # ------------------------------------------------------------------
    def _loss(self, params, norm_obs, norm_a, old_logp, adv, tar_val,
              rand_mask):
        cfg = self.cfg
        mean, logstd = self.net.apply(params, norm_obs,
                                      method="actor")
        pred_val = self.net.apply(params, norm_obs, method="critic")

        critic_loss = jnp.mean((tar_val - pred_val) ** 2)

        logp = dist.log_prob(mean, logstd, norm_a)
        ratio = jnp.exp(logp - old_logp)
        surr0 = adv * ratio
        surr1 = adv * jnp.clip(ratio, 1.0 - cfg.ppo_clip_ratio,
                               1.0 + cfg.ppo_clip_ratio)
        per_sample = jnp.minimum(surr0, surr1)
        mask_sum = jnp.maximum(jnp.sum(rand_mask), 1.0)
        actor_loss = -jnp.sum(per_sample * rand_mask) / mask_sum
        # exploding-critic guard: when the critic can't be trusted, stop
        # its advantages from driving the actor (reference:
        # ppo_agent.py:225-238 detaches actor_loss at critic_loss > 20)
        actor_loss = jnp.where(critic_loss > self.cfg.critic_loss_guard,
                               jax.lax.stop_gradient(actor_loss),
                               actor_loss)

        # action bound loss on the (normalized) mode
        viol_lo = jnp.minimum(mean - (-1.0), 0.0)
        viol_hi = jnp.maximum(mean - 1.0, 0.0)
        bound_loss = jnp.mean(jnp.sum(viol_lo**2 + viol_hi**2, axis=-1))

        loss = (actor_loss + cfg.critic_loss_weight * critic_loss
                + cfg.action_bound_weight * bound_loss)
        if cfg.action_entropy_weight != 0.0:
            loss = loss - cfg.action_entropy_weight * jnp.mean(
                dist.entropy(logstd))

        clip_frac = jnp.sum(
            (jnp.abs(ratio - 1.0) > cfg.ppo_clip_ratio) * rand_mask) / mask_sum
        aux = dict(actor_loss=actor_loss, critic_loss=critic_loss,
                   bound_loss=bound_loss, clip_frac=clip_frac)
        return loss, aux

    # ------------------------------------------------------------------
    def train_iter(self, lib, agent: AgentState,
                   axis_name: Optional[str] = None
                   ) -> Tuple[AgentState, TrainMetrics]:
        """One full PPO iteration (jit/shard_map this)."""
        cfg = self.cfg

        # annealed exploration probability
        import math
        if math.isfinite(cfg.exp_anneal_samples):
            frac = jnp.clip(agent.sample_count / cfg.exp_anneal_samples, 0, 1)
            exp_prob = (1 - frac) * cfg.exp_prob_beg + frac * cfg.exp_prob_end
        else:
            exp_prob = jnp.asarray(cfg.exp_prob_beg)

        env_state, rng, batch = self.rollout(lib, agent, exp_prob)

        obs_norm = norm_lib.update(agent.obs_norm, batch["obs"],
                                   axis_name=axis_name)

        # --- TD(lambda) targets -------------------------------------------
        t, b = batch["reward"].shape
        norm_next = norm_lib.normalize(obs_norm, batch["next_obs"])
        next_vals = self.net.apply(agent.params, norm_next,
                                   method="critic")
        val_min = cfg.reward_min / (1.0 - cfg.discount)
        val_max = cfg.reward_max / (1.0 - cfg.discount)
        next_vals = jnp.clip(next_vals, val_min, val_max)
        # SUCC bootstrap kept for parity with the reference's value targets
        # (learning/base_agent.py:408-422).  NOTE: like the reference, no
        # shipped env emits DoneFlags.SUCC (reference envs only *handle* it,
        # dm_env.py:768); the branch is live for custom envs that do.
        next_vals = jnp.where(batch["done"] == DoneFlags.SUCC,
                              cfg.reward_succ / (1.0 - cfg.discount),
                              next_vals)
        next_vals = jnp.where(batch["done"] == DoneFlags.FAIL,
                              cfg.reward_fail / (1.0 - cfg.discount),
                              next_vals)
        tar_val = rl_util.compute_td_lambda_return(
            batch["reward"], next_vals, batch["done"], cfg.discount,
            cfg.td_lambda)

        norm_obs = norm_lib.normalize(obs_norm, batch["obs"])
        vals = self.net.apply(agent.params, norm_obs,
                              method="critic")
        adv = tar_val - vals
        mask = batch["rand_mask"]
        mask_sum = jnp.maximum(jnp.sum(mask), 1.0)
        adv_mean = jnp.sum(adv * mask) / mask_sum
        adv_var = jnp.sum(((adv - adv_mean) ** 2) * mask) / mask_sum
        if axis_name is not None:
            adv_mean = jax.lax.pmean(adv_mean, axis_name)
            adv_var = jax.lax.pmean(adv_var, axis_name)
        adv_std = jnp.sqrt(jnp.maximum(adv_var, 1e-10))
        norm_adv = jnp.clip((adv - adv_mean) / jnp.maximum(adv_std, 1e-5),
                            -cfg.norm_adv_clip, cfg.norm_adv_clip)

        # --- minibatch epochs ---------------------------------------------
        flat = {
            "norm_obs": norm_obs.reshape(t * b, -1),
            "norm_a": batch["norm_a"].reshape(t * b, -1),
            "logp": batch["logp"].reshape(t * b),
            "adv": norm_adv.reshape(t * b),
            "tar_val": tar_val.reshape(t * b),
            "rand_mask": mask.reshape(t * b),
        }
        mb_size = min(cfg.batch_size * b, t * b)
        num_mb = max(t * b // mb_size, 1)

        def epoch_fn(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, t * b)

            def mb_fn(carry2, mb_idx):
                params2, opt_state2 = carry2
                idx = jax.lax.dynamic_slice_in_dim(perm, mb_idx * mb_size,
                                                   mb_size)
                grads, aux = jax.grad(self._loss, has_aux=True)(
                    params2, flat["norm_obs"][idx], flat["norm_a"][idx],
                    flat["logp"][idx], flat["adv"][idx],
                    flat["tar_val"][idx], flat["rand_mask"][idx])
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state2 = self.tx.update(grads, opt_state2,
                                                     params2)
                params2 = optax.apply_updates(params2, updates)
                return (params2, opt_state2), aux

            (params, opt_state), auxes = jax.lax.scan(
                mb_fn, (params, opt_state), jnp.arange(num_mb))
            return (params, opt_state), auxes

        rng, k_perm = jax.random.split(rng)
        (params, opt_state), auxes = jax.lax.scan(
            epoch_fn, (agent.params, agent.opt_state),
            jax.random.split(k_perm, cfg.update_epochs))

        samples = jnp.asarray(t * b, jnp.float32)
        if axis_name is not None:
            samples = jax.lax.psum(samples, axis_name)

        dones = batch["done"] != DoneFlags.NULL
        metrics = TrainMetrics(
            mean_reward=jnp.mean(batch["reward"]),
            mean_return_done=jnp.mean(tar_val),
            actor_loss=jnp.mean(auxes["actor_loss"]),
            critic_loss=jnp.mean(auxes["critic_loss"]),
            bound_loss=jnp.mean(auxes["bound_loss"]),
            clip_frac=jnp.mean(auxes["clip_frac"]),
            adv_mean=adv_mean, adv_std=adv_std,
            num_dones=jnp.sum(dones.astype(jnp.int32)),
            num_fails=jnp.sum(
                (batch["done"] == DoneFlags.FAIL).astype(jnp.int32)),
            mean_ep_time=jnp.mean(batch["ep_time"]),
            tracking_error=jnp.mean(batch["tracking_error"], axis=(0, 1)),
        )
        new_agent = AgentState(
            params=params, opt_state=opt_state, obs_norm=obs_norm,
            env_state=env_state, rng=rng,
            sample_count=agent.sample_count + samples)
        return new_agent, metrics
