"""Physics recording stage (parc_4).

Rolls out the trained tracker deterministically on every dataset motion
(one env per motion, no random reset), records the physically-simulated
frames + contact flags, keeps successful tracks, and retries failures from
later start-time fractions.

Reference parity: parc_4_phys_record.py + learning/dm_ppo_agent.py:414-594
(record_motions with start-fraction retry schedule) +
envs/ig_parkour/ig_parkour_env.py:895-995 (write_agent_states).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml
from parc_tpu.envs.base import DoneFlags
from parc_tpu.learning import normalizer as norm_lib
from parc_tpu.learning.networks import ActorCritic
from parc_tpu.learning.ppo import AgentState, PPOAgent
from parc_tpu.utils import rotation as rot


@dataclasses.dataclass
class RecordConfig:
    output_dir: str = "output/recorded"
    start_fractions: tuple = (0.0, 0.1, 0.2, 0.3, 0.4, 0.5)
    success_slack: float = 2.0 / 30.0  # motion_time >= length - 2*dt
    max_steps: int = 1000
    # also store per-step policy observations in the recorded clips
    # (reference recorded pkls carry 'obs'/'obs_shapes')
    save_obs: bool = False


def _rollout_record(agent: PPOAgent, lib: ml.MotionLib, state: AgentState,
                    motion_ids: jax.Array, start_times: jax.Array,
                    num_steps: int, rng: jax.Array):
    """Deterministic rollout recording 34-D frames + contacts per step."""
    env = agent.env
    model = agent.env.model

    def run(rng, lib, state, motion_ids, start_times):
        es = env.reset(lib, rng, num_envs=motion_ids.shape[0],
                       motion_ids=motion_ids, start_times=start_times)

        def step_fn(carry, _):
            es, alive = carry
            # capture the PRE-step state: the post-step state of done envs
            # is already auto-reset in-graph, so recording it would splice
            # a respawn pose into the clip.  Pre-step capture yields
            # [s_0, ..., s_{done-1}] including the initial state, matching
            # the reference's per-step appends (ig_parkour_env.py:957-995).
            frame34 = jnp.concatenate([
                es.sim.root_pos,
                rot.quat_to_exp_map(es.sim.root_rot),
                cm.rot_to_dof(model, es.sim.joint_rot)], axis=-1)
            contacts = (jnp.linalg.norm(es.sim.contact_forces, axis=-1)
                        > 1e-3).astype(jnp.float32)
            norm_obs = norm_lib.normalize(state.obs_norm, es.obs)
            mean, _ = agent.net.apply(state.params, norm_obs,
                                      method="actor")
            action = agent.a_mid + agent.a_scale * mean
            new_es = env.step(lib, es, action)
            # freeze envs that finished (done != NULL stops recording)
            now_done = new_es.done != DoneFlags.NULL
            # pre-reset motion time of this step (new_es.motion_times is
            # already re-sampled for done envs by the in-graph auto-reset)
            mt_pre = es.motion_times + env.cfg.control_dt
            out = (frame34, contacts, new_es.done, mt_pre,
                   alive, es.obs)
            alive = alive & ~now_done
            return (new_es, alive), out

        alive0 = jnp.ones(motion_ids.shape, bool)
        _, (frames, contacts, dones, mtimes, alive, obs) = jax.lax.scan(
            step_fn, (es, alive0), None, length=num_steps)
        return frames, contacts, dones, mtimes, alive, obs

    # all device data enters as jit arguments (no device-array closures)
    return jax.jit(run, static_argnames=())(rng, lib, state, motion_ids,
                                            start_times)


def record_motions(agent: PPOAgent, lib: ml.MotionLib, state: AgentState,
                   cfg: RecordConfig = RecordConfig(),
                   seed: int = 0) -> List[Optional[md.MotionData]]:
    """Record every motion in the library; returns one clip (or None) per
    motion.  Failed motions retry from later start fractions."""
    m = lib.num_motions
    fps = float(lib.fps[0])
    dt = 1.0 / fps
    results: List[Optional[md.MotionData]] = [None] * m
    pending = np.arange(m)

    # fixed shapes across retry rounds: always roll the FULL motion set
    # (pending ones matter, the rest are overwritten) with a global step
    # count, so the rollout compiles exactly once instead of once per
    # (shrinking) retry batch — remote-TPU compiles are minutes each.
    all_lengths = np.asarray(lib.lengths)
    num_steps = min(int(np.ceil(all_lengths.max() / dt)) + 2, cfg.max_steps)
    ids = jnp.arange(m, dtype=jnp.int32)

    for fi, frac in enumerate(cfg.start_fractions):
        if len(pending) == 0:
            break
        lengths = all_lengths
        start_times = jnp.asarray(frac * all_lengths, jnp.float32)

        frames, contacts, dones, mtimes, alive, obs = _rollout_record(
            agent, lib, state, ids, start_times, num_steps,
            jax.random.PRNGKey(seed + fi))
        frames = np.asarray(frames)      # (T, B, 34)
        contacts = np.asarray(contacts)  # (T, B, J)
        obs = np.asarray(obs) if cfg.save_obs else None  # (T, B, obs_dim)
        dones = np.asarray(dones)
        mtimes = np.asarray(mtimes)
        del alive  # end-of-clip accounting comes from the done flags

        still_pending = []
        for mid in pending:
            k = int(mid)  # env k tracks motion k (full-set rollout)
            # first step where the env finished
            done_steps = np.nonzero(dones[:, k] != DoneFlags.NULL)[0]
            end = int(done_steps[0]) + 1 if len(done_steps) else num_steps
            final_time = mtimes[end - 1, k]
            # success is gated on motion time alone: the tracker must have
            # played the clip through to (nearly) its end — a truncated
            # rollout or an early TIME done is NOT a successful track
            # (reference: learning/dm_ppo_agent.py:476-512, success iff
            # motion time >= length - 2*dt)
            success = final_time >= lengths[k] - cfg.success_slack
            if not success:
                still_pending.append(mid)
                continue
            clip_frames = frames[:end, k]
            clip_contacts = contacts[:end, k]
            terrain = None
            hf = np.asarray(lib.terrain_hf[mid])
            terrain = md.HostTerrain(
                hf=hf,
                min_point=np.asarray(lib.terrain_min_point[mid]),
                dxdy=np.asarray(lib.terrain_dxdy))
            results[mid] = md.MotionData(
                frames=clip_frames.astype(np.float32), fps=fps,
                contacts=clip_contacts.astype(np.float32), terrain=terrain,
                obs=(obs[:end, k].astype(np.float32)
                     if obs is not None else None))
        pending = np.asarray(still_pending, np.int64)

    return results


def save_recorded(results, out_dir: str, prefix: str = "recorded"):
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, clip in enumerate(results):
        if clip is None:
            continue
        path = os.path.join(out_dir, f"{prefix}_{i:04d}.npz")
        md.save_motion_data(path, clip)
        paths.append(path)
    return paths
