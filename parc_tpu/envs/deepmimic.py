"""DeepMimic reference-motion tracking environment (pure-JAX, batched).

The training env of the tracker stage: each env tracks a reference motion
clip on that clip's own terrain.  Everything — stepping, observation,
reward, termination, curriculum statistics, masked resets — is one jitted
SPMD program over the env batch; there are no host syncs inside a rollout.

Reference parity:
* env composition/obs assembly — envs/ig_parkour/ig_parkour_env.py:1054-1244
* reward — envs/ig_parkour/mgdm_dm_util.py:327-390 (+ contact reward :555-576)
* termination — envs/ig_parkour/mgdm_dm_util.py:392-460
* ref-state init + fail-rate curriculum — envs/ig_parkour/dm_env.py:517-595,
  720-783 (the per-motion fail-rate EMA host loop becomes a segment reduce)

Design departure: each env collides with its own motion's terrain via a
batched heightfield gather (terrain_idx = motion_id) instead of tiling all
terrains into one world mesh — PhysX needed one world; a TPU program does
not.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_lib as ml
from parc_tpu.envs import obs as obs_mod
from parc_tpu.envs.base import DoneFlags, EnvConfig, EnvState
from parc_tpu.physics import engine
from parc_tpu.utils import rotation as rot
from parc_tpu.utils import terrain as terrain_lib


@struct.dataclass
class ResetPool:
    """Pre-sampled reset states + their observations, flattened [k*N].

    The reference resets only the done env indices each step
    (learning/base_agent.py:388-392 -> env.reset(done_indices)) — a
    dynamic-shape pattern XLA cannot compile.  Round 1 instead computed a
    full-batch reset state + obs EVERY step and masked it in, which made
    obs assembly the single largest non-physics cost (a second full pass,
    ~1.6 ms/step @4096 envs).  The pool amortizes it: k full reset
    batches are sampled and observed ONCE per rollout iteration, and a
    done env pulls entry ``slot*N + env_index`` (slot = its reset count
    this iteration, mod k).  Entries are i.i.d. draws from the same
    reset distribution, so semantics match the reference up to (a) the
    fail-rate curriculum weights being one iteration stale and (b) entry
    reuse if an env resets more than k times per iteration.
    """

    sim: engine.SimState      # [k*N, ...]
    motion_ids: jax.Array     # (k*N,)
    times: jax.Array          # (k*N,)
    obs: jax.Array            # (k*N, obs_dim)
    k: int = struct.field(pytree_node=False, default=4)


def _pool_take(pool: ResetPool, slot: jax.Array, n: int):
    """Gather each env's reset entry ``slot[i]*n + i`` from the pool.

    One contiguous-row gather per env (rows are whole obs/state vectors),
    NOT the many-small-points pattern that serializes on TPU
    (utils/gather.py applies to the latter).

    Measured dead end (round 2): packing all leaves + obs into one
    [k*N, P] matrix so the take is a single gather benched 1.8x SLOWER
    end-to-end @4096 envs — XLA fuses the per-leaf gathers into their
    consumers, while the packed row materializes a large intermediate
    plus relayout slices.  Keep the per-leaf form."""
    idx = slot * n + jnp.arange(n, dtype=slot.dtype)
    take = lambda a: jnp.take(a, idx, axis=0)
    return (jax.tree.map(take, pool.sim), take(pool.motion_ids),
            take(pool.times), take(pool.obs))


class DeepMimicEnv:
    """Static configuration + pure step/reset functions.

    The MotionLib is passed into every function (not stored) so the caller
    can swap libraries (mgdm replanning) without retracing anything else.
    """

    def __init__(self, model: cm.CharModel, sim_params: engine.SimParams,
                 cfg: EnvConfig):
        self.model = model
        self.sim_params = sim_params
        self.cfg = cfg

        names = list(model.body_names)
        # host numpy: closed-over constants must not live on device
        self.key_body_ids = np.asarray(
            [names.index(n) for n in cfg.key_bodies], np.int32)
        self.contact_body_ids = tuple(
            names.index(n) for n in cfg.contact_bodies)

        # per-dof error weights from per-joint weights, normalized as in the
        # reference (weights divided by total joint weight sum)
        jw = np.asarray(cfg.joint_err_w, np.float64)
        jw = jw / jw.sum()
        dof_w = np.zeros(model.dof_size)
        for j in range(1, model.num_bodies):
            o = model.dof_offsets[j]
            d = cm._DOF_DIMS[model.joint_types[j]]
            dof_w[o:o + d] = jw[j - 1]
        self.joint_err_w = np.asarray(jw, np.float32)
        self.dof_err_w = np.asarray(dof_w, np.float32)
        self.pose_term_dist = np.asarray(cfg.pose_termination_dist,
                                         np.float32)
        self.contact_weights = np.full((model.num_bodies,),
                                       cfg.contact_weight, np.float32)

        num_key = len(cfg.key_bodies)
        steps = len(cfg.tar_obs_steps)
        nb = model.num_bodies
        char_dim = ((1 if cfg.root_height_obs else 0) + 6 + 3 + 3
                    + 6 * (nb - 1) + model.dof_size + 3 * num_key)
        tar_dim = steps * (3 + 6 + 6 * (nb - 1) + 3 * num_key)
        segments = [("char_obs", char_dim, True),
                    ("tar_obs", tar_dim, True)]
        if cfg.use_contact_info:
            segments.append(("contact_obs", nb, False))
            segments.append(("tar_contact_obs", steps * nb, False))
        segments.append(("hf_obs", obs_mod.num_ray_points(cfg), False))
        self.obs_layout = obs_mod.ObsLayout(
            names=tuple(s[0] for s in segments),
            sizes=tuple(s[1] for s in segments),
            normalized=tuple(s[2] for s in segments))

    # ------------------------------------------------------------------
    @property
    def obs_dim(self) -> int:
        return self.obs_layout.total

    @property
    def action_dim(self) -> int:
        return self.model.dof_size

    def action_bounds(self) -> Tuple[jax.Array, jax.Array]:
        """PD-target action bounds (reference: envs/ig_char_env.py:308-349:
        sphericals get symmetric 1.2*max|limit|, hinges mid +- 0.7*range)."""
        model = self.model
        lo = np.zeros(model.dof_size, np.float32)
        hi = np.zeros(model.dof_size, np.float32)
        llo = np.asarray(model.dof_limits_lower)
        lhi = np.asarray(model.dof_limits_upper)
        for j in range(1, model.num_bodies):
            o = model.dof_offsets[j]
            jt = model.joint_types[j]
            if jt == cm.SPHERICAL:
                s = 1.2 * max(np.max(np.abs(llo[o:o + 3])),
                              np.max(np.abs(lhi[o:o + 3])))
                lo[o:o + 3], hi[o:o + 3] = -s, s
            elif jt == cm.HINGE:
                mid = 0.5 * (lhi[o] + llo[o])
                scale = 0.7 * (lhi[o] - llo[o])
                lo[o], hi[o] = mid - scale, mid + scale
        return lo, hi  # host numpy (closed-over constants)

    def local_shard(self, n_shards: int) -> "DeepMimicEnv":
        """Per-shard env clone for shard_map data parallelism: the same env
        with ``cfg.num_envs / n_shards`` envs.  Row semantics here are
        batch-size agnostic, so the clone behaves identically on its local
        slice of a P('data')-sharded batch (parallel/mesh.py)."""
        import dataclasses as _dc
        assert self.cfg.num_envs % n_shards == 0, (
            f"num_envs {self.cfg.num_envs} not divisible by {n_shards}")
        cfg = _dc.replace(self.cfg, num_envs=self.cfg.num_envs // n_shards)
        return DeepMimicEnv(self.model, self.sim_params, cfg)

    # ------------------------------------------------------------------
    # Reset
    # ------------------------------------------------------------------

    def _sample_reset(self, lib: ml.MotionLib, rng: jax.Array, n: int,
                      fail_rates: jax.Array):
        """Sample motions (fail-rate curriculum weighted) and start states."""
        cfg = self.cfg
        k_m, k_t, k_xy = jax.random.split(rng, 3)
        w = lib.weights * (cfg.min_motion_weight + fail_rates)
        motion_ids = ml.sample_motions(lib, k_m, n, weights=w)
        if cfg.rand_reset:
            times = ml.sample_time(lib, k_t, motion_ids,
                                   truncate_time=cfg.control_dt)
        else:
            times = jnp.zeros((n,))
        frame = ml.calc_motion_frame(lib, motion_ids, times)

        offset = jnp.zeros((n, 3))
        if cfg.rand_root_pos_offset_scale > 0 and cfg.rand_reset:
            xy = cfg.rand_root_pos_offset_scale * jax.random.normal(
                k_xy, (n, 2))
            offset = offset.at[..., 0:2].set(xy)
        offset = offset.at[..., 2].add(cfg.ref_height_buffer)

        sim = engine.create_state(
            self.model,
            root_pos=frame.root_pos + offset,
            root_rot=frame.root_rot,
            joint_rot=frame.joint_rot,
            root_vel=frame.root_vel,
            root_ang_vel=frame.root_ang_vel,
            dof_vel=frame.dof_vel)
        return motion_ids, times, sim

    def build_reset_pool(self, lib: ml.MotionLib, rng: jax.Array,
                         fail_rates: jax.Array, n: int,
                         k: int = 4) -> ResetPool:
        """Sample k full reset batches + their obs (see ResetPool)."""
        ids_l, times_l, sim_l, obs_l = [], [], [], []
        for c in range(k):
            ids, times, sim = self._sample_reset(
                lib, jax.random.fold_in(rng, c), n, fail_rates)
            tmp = self._obs_view(sim, ids, times)
            obs_l.append(self._compute_obs(lib, tmp))
            ids_l.append(ids)
            times_l.append(times)
            sim_l.append(sim)
        cat = lambda xs: jnp.concatenate(xs, axis=0)
        return ResetPool(sim=jax.tree.map(lambda *xs: cat(xs), *sim_l),
                         motion_ids=cat(ids_l), times=cat(times_l),
                         obs=cat(obs_l), k=k)

    def _obs_view(self, sim, motion_ids, motion_times) -> EnvState:
        """Minimal EnvState for _compute_obs (unused fields are zeros and
        dead-code-eliminated by XLA)."""
        n = motion_ids.shape[0]
        z = jnp.zeros((n,))
        return EnvState(
            sim=sim, obs=z, terminal_obs=z, reward=z,
            done=jnp.zeros((n,), jnp.int32), time=z, terminal_times=z,
            motion_ids=motion_ids, motion_times=motion_times,
            start_times=motion_times, rng=jax.random.PRNGKey(0),
            fail_rates=z, reward_components=z, tracking_error=z)

    def reset(self, lib: ml.MotionLib, rng: jax.Array,
              num_envs: Optional[int] = None,
              motion_ids: Optional[jax.Array] = None,
              start_times: Optional[jax.Array] = None) -> EnvState:
        """Full reset; pass motion_ids/start_times for demo/record mode
        (reference: demo_mode motion_id = env_id)."""
        n = num_envs or self.cfg.num_envs
        rng, sub = jax.random.split(rng)
        fail_rates = jnp.full((lib.num_motions,), 0.5)
        if motion_ids is not None:
            times = (jnp.zeros((n,)) if start_times is None else start_times)
            frame = ml.calc_motion_frame(lib, motion_ids, times)
            sim = engine.create_state(
                self.model,
                root_pos=frame.root_pos.at[..., 2].add(
                    self.cfg.ref_height_buffer),
                root_rot=frame.root_rot, joint_rot=frame.joint_rot,
                root_vel=frame.root_vel, root_ang_vel=frame.root_ang_vel,
                dof_vel=frame.dof_vel)
        else:
            motion_ids, times, sim = self._sample_reset(lib, sub, n,
                                                        fail_rates)
        state = EnvState(
            sim=sim,
            obs=jnp.zeros((n, self.obs_dim)),
            terminal_obs=jnp.zeros((n, self.obs_dim)),
            reward=jnp.zeros((n,)),
            done=jnp.zeros((n,), jnp.int32),
            time=jnp.zeros((n,)),
            terminal_times=jnp.zeros((n,)),
            motion_ids=motion_ids,
            motion_times=times,
            start_times=times,
            rng=rng,
            fail_rates=fail_rates,
            reward_components=jnp.zeros((n, 6)),
            tracking_error=jnp.zeros((n, 7)),
        )
        obs0 = self._compute_obs(lib, state)
        return state.replace(obs=obs0, terminal_obs=obs0)

    # ------------------------------------------------------------------
    # Observation
    # ------------------------------------------------------------------

    def _tar_frames(self, lib: ml.MotionLib, motion_ids, motion_times):
        steps = jnp.asarray(self.cfg.tar_obs_steps, jnp.float32)
        times = motion_times[..., None] + steps * self.cfg.control_dt
        ids = jnp.broadcast_to(motion_ids[..., None], times.shape)
        return ml.calc_motion_frame(lib, ids, times)

    def _compute_obs(self, lib: ml.MotionLib, state: EnvState,
                     tar: Optional[ml.MotionFrame] = None) -> jax.Array:
        cfg = self.cfg
        sim = state.sim
        key_pos = sim.body_pos[..., self.key_body_ids, :]
        char_obs = obs_mod.compute_char_obs(
            sim.root_pos, sim.root_rot, sim.root_vel, sim.root_ang_vel,
            sim.joint_rot, sim.dof_vel, key_pos,
            cfg.global_obs, cfg.root_height_obs)

        if tar is None:
            tar = self._tar_frames(lib, state.motion_ids, state.motion_times)
        tar_body_pos, _ = cm.forward_kinematics(
            self.model, tar.root_pos, tar.root_rot, tar.joint_rot)
        tar_key_pos = tar_body_pos[..., self.key_body_ids, :]
        tar_obs = obs_mod.compute_tar_obs(
            sim.root_pos, sim.root_rot, tar.root_pos, tar.root_rot,
            tar.joint_rot, tar_key_pos, cfg.global_obs)

        parts = [char_obs, tar_obs]
        if cfg.use_contact_info:
            contact = (jnp.linalg.norm(sim.contact_forces, axis=-1)
                       > 1e-3).astype(char_obs.dtype)
            tar_contacts = tar.contacts.reshape(tar.contacts.shape[:-2] + (-1,))
            parts.extend([contact, tar_contacts])

        ray_pts = obs_mod.ray_sample_points(sim.root_pos, sim.root_rot, cfg)
        hf_obs = obs_mod.compute_hf_obs(
            lib.terrain_hf, lib.terrain_min_point, lib.terrain_dxdy,
            state.motion_ids, ray_pts, sim.root_pos,
            cfg.min_obs_h, cfg.max_obs_h)
        parts.append(hf_obs)
        return jnp.concatenate(parts, axis=-1)

    # ------------------------------------------------------------------
    # Reward
    # ------------------------------------------------------------------

    def _compute_reward(self, state: EnvState, ref: ml.MotionFrame,
                        ref_body_pos: jax.Array):
        cfg = self.cfg
        sim = state.sim
        pose_scale, vel_scale = 0.25, 0.01
        root_pose_scale, root_vel_scale, key_pos_scale = 5.0, 1.0, 10.0

        pose_diff = rot.quat_diff_angle(sim.joint_rot, ref.joint_rot)
        pose_err = jnp.sum(self.joint_err_w * pose_diff**2, axis=-1)

        vel_diff = ref.dof_vel - sim.dof_vel
        vel_err = jnp.sum(self.dof_err_w * vel_diff**2, axis=-1)

        root_pos_diff = ref.root_pos - sim.root_pos
        if not cfg.track_root:
            root_pos_diff = root_pos_diff.at[..., 0:2].set(0.0)
        if not cfg.track_root_h:
            root_pos_diff = root_pos_diff.at[..., 2].set(0.0)
        root_pos_err = jnp.sum(root_pos_diff**2, axis=-1)

        key_pos = (sim.body_pos[..., self.key_body_ids, :]
                   - sim.root_pos[..., None, :])
        ref_key = (ref_body_pos[..., self.key_body_ids, :]
                   - ref.root_pos[..., None, :])

        root_rot, root_vel, root_ang_vel = (sim.root_rot, sim.root_vel,
                                            sim.root_ang_vel)
        tr_rot, tr_vel, tr_ang = (ref.root_rot, ref.root_vel,
                                  ref.root_ang_vel)
        if not cfg.track_root:
            hi = rot.calc_heading_quat_inv(sim.root_rot)
            root_rot = rot.quat_mul(hi, root_rot)
            root_vel = rot.quat_rotate(hi, root_vel)
            root_ang_vel = rot.quat_rotate(hi, root_ang_vel)
            key_pos = rot.quat_rotate(hi[..., None, :], key_pos)
            hit = rot.calc_heading_quat_inv(ref.root_rot)
            tr_rot = rot.quat_mul(hit, tr_rot)
            tr_vel = rot.quat_rotate(hit, tr_vel)
            tr_ang = rot.quat_rotate(hit, tr_ang)
            ref_key = rot.quat_rotate(hit[..., None, :], ref_key)

        root_rot_err = rot.quat_diff_angle(root_rot, tr_rot)**2
        root_vel_err = jnp.sum((tr_vel - root_vel)**2, axis=-1)
        root_ang_err = jnp.sum((tr_ang - root_ang_vel)**2, axis=-1)
        key_pos_err = jnp.sum(jnp.sum((ref_key - key_pos)**2, axis=-1),
                              axis=-1)

        pose_r = jnp.exp(-pose_scale * pose_err)
        vel_r = jnp.exp(-vel_scale * vel_err)
        root_pose_r = jnp.exp(-root_pose_scale
                              * (root_pos_err + 0.1 * root_rot_err))
        root_vel_r = jnp.exp(-root_vel_scale
                             * (root_vel_err + 0.1 * root_ang_err))
        key_pos_r = jnp.exp(-key_pos_scale * key_pos_err)

        reward = (cfg.pose_w * pose_r + cfg.vel_w * vel_r
                  + cfg.root_pos_w * root_pose_r
                  + cfg.root_vel_w * root_vel_r
                  + cfg.key_pos_w * key_pos_r)

        contact_r = jnp.zeros_like(reward)
        if cfg.use_contact_info:
            forces = jnp.minimum(
                jnp.linalg.norm(sim.contact_forces, axis=-1), 1.0)
            per_body = (ref.contacts * forces
                        - (1.0 - ref.contacts) * forces)
            contact_r = jnp.mean(self.contact_weights * per_body, axis=-1)
            reward = reward + contact_r

        components = jnp.stack(
            [pose_r, vel_r, root_pose_r, root_vel_r, key_pos_r, contact_r],
            axis=-1)
        return reward, components

    # ------------------------------------------------------------------
    # Termination
    # ------------------------------------------------------------------

    def _compute_done(self, lib: ml.MotionLib, state: EnvState,
                      ref: ml.MotionFrame, ref_body_pos: jax.Array):
        cfg = self.cfg
        sim = state.sim
        done = jnp.full_like(state.done, DoneFlags.NULL)

        timeout = ((state.time >= cfg.episode_length)
                   | (state.motion_times >= lib.lengths[state.motion_ids]))
        done = jnp.where(timeout, DoneFlags.TIME, done)

        if cfg.enable_early_termination:
            failed = jnp.zeros(state.done.shape, bool)
            if len(self.contact_body_ids) > 0:
                allowed = np.zeros(self.model.num_bodies, bool)
                allowed[list(self.contact_body_ids)] = True
                masked = jnp.where(jnp.asarray(allowed)[None, :, None], 0.0,
                                   sim.contact_forces)
                fall_contact = jnp.any(
                    jnp.any(jnp.abs(masked) > 0.1, axis=-1), axis=-1)
                # body height relative to the terrain under the root
                ground_h = obs_mod.compute_hf_obs(
                    lib.terrain_hf, lib.terrain_min_point, lib.terrain_dxdy,
                    state.motion_ids, sim.root_pos[..., None, 0:2],
                    jnp.zeros_like(sim.root_pos), -100.0, 100.0)[..., 0]
                rel_h = sim.body_pos[..., 2] - ground_h[..., None]
                low = rel_h < cfg.termination_height
                low = jnp.where(jnp.asarray(allowed)[None, :], False, low)
                fall_height = jnp.any(low, axis=-1)
                failed = failed | (fall_contact & fall_height)

            if cfg.pose_termination:
                body_rel = (sim.body_pos[..., 1:, :]
                            - sim.body_pos[..., 0:1, :])
                ref_rel = ref_body_pos[..., 1:, :] - ref_body_pos[..., 0:1, :]
                dist2 = jnp.sum((ref_rel - body_rel)**2, axis=-1)
                pose_fail = jnp.any(dist2 > self.pose_term_dist**2, axis=-1)
                if cfg.track_root:
                    root_dist2 = jnp.sum(
                        (sim.root_pos - ref.root_pos)**2, axis=-1)
                    pose_fail |= (root_dist2
                                  > cfg.root_pos_termination_dist**2)
                    rot_err = rot.quat_diff_angle(sim.root_rot, ref.root_rot)
                    pose_fail |= (jnp.abs(rot_err)
                                  > cfg.root_rot_termination_angle)
                failed = failed | pose_fail

            failed = failed & (state.time > 1e-5)
            # FAIL overrides a simultaneous TIME (reference mgdm_dm_util
            # compute_done assigns done[failed]=FAIL after done[timeout]=
            # TIME): a failing env must not bootstrap its value target
            done = jnp.where(failed, DoneFlags.FAIL, done)
        return done

    def _tracking_error(self, state: EnvState, ref: ml.MotionFrame,
                        ref_body_pos, ref_body_rot):
        """7-component tracking error (reference:
        envs/ig_parkour/mgdm_dm_util.py:578-611)."""
        sim = state.sim
        body_rot = sim.body_rot[..., 1:, :]
        pose_err = jnp.mean(
            jnp.abs(rot.quat_diff_angle(body_rot, ref_body_rot[..., 1:, :])),
            axis=-1)
        root_pos_err = jnp.linalg.norm(ref.root_pos - sim.root_pos, axis=-1)
        body_rel = sim.body_pos - sim.root_pos[..., None, :]
        ref_rel = ref_body_pos - ref.root_pos[..., None, :]
        body_pos_err = jnp.mean(
            jnp.linalg.norm(ref_rel - body_rel, axis=-1), axis=-1)
        root_rot_err = jnp.abs(
            rot.quat_diff_angle(sim.root_rot, ref.root_rot))
        dof_vel_err = jnp.mean(jnp.abs(ref.dof_vel - sim.dof_vel), axis=-1)
        root_vel_err = jnp.mean(jnp.abs(ref.root_vel - sim.root_vel), axis=-1)
        root_ang_err = jnp.mean(
            jnp.abs(ref.root_ang_vel - sim.root_ang_vel), axis=-1)
        return jnp.stack([root_pos_err, root_rot_err, body_pos_err, pose_err,
                          dof_vel_err, root_vel_err, root_ang_err], axis=-1)

    # ------------------------------------------------------------------
    # Step
    # ------------------------------------------------------------------

    def step(self, lib: ml.MotionLib, state: EnvState,
             actions: jax.Array,
             reset_pool: Optional[ResetPool] = None,
             pool_slot: Optional[jax.Array] = None) -> EnvState:
        """One control step with masked auto-reset of done envs.

        With ``reset_pool`` (training rollouts), done envs pull their
        reset state + obs from the pre-sampled pool — one obs pass per
        step instead of two.  Without it (record / test / generic use),
        the reset state is sampled and observed inline.
        """
        cfg = self.cfg
        batched_terrain = terrain_lib.Terrain(
            hf=lib.terrain_hf,
            hf_mask=jnp.zeros(lib.terrain_hf.shape, bool),
            hf_maxmin=jnp.zeros(lib.terrain_hf.shape + (2,)),
            min_point=lib.terrain_min_point,
            dxdy=lib.terrain_dxdy)

        sim = engine.control_step(
            self.model, self.sim_params, batched_terrain, state.sim, actions,
            sim_steps=cfg.sim_steps_per_control,
            terrain_idx=state.motion_ids)

        time = state.time + cfg.control_dt
        motion_times = state.motion_times + cfg.control_dt
        state = state.replace(sim=sim, time=time, motion_times=motion_times)

        ref = ml.calc_motion_frame(lib, state.motion_ids, motion_times)
        ref_body_pos, ref_body_rot = cm.forward_kinematics(
            self.model, ref.root_pos, ref.root_rot, ref.joint_rot)

        reward, comps = self._compute_reward(state, ref, ref_body_pos)
        done = self._compute_done(lib, state, ref, ref_body_pos)
        track_err = self._tracking_error(state, ref, ref_body_pos,
                                         ref_body_rot)

        # fail-rate EMA per motion via segment reduce (no host loop)
        is_done = done != DoneFlags.NULL
        is_fail = (done == DoneFlags.FAIL).astype(jnp.float32)
        m = lib.num_motions
        cnt = jax.ops.segment_sum(is_done.astype(jnp.float32),
                                  state.motion_ids, m)
        fails = jax.ops.segment_sum(is_fail * is_done, state.motion_ids, m)
        obs_rate = fails / jnp.maximum(cnt, 1.0)
        ema = cfg.fail_rate_ema
        fail_rates = jnp.where(cnt > 0,
                               ema * state.fail_rates + (1 - ema) * obs_rate,
                               state.fail_rates)

        obs = self._compute_obs(lib, state)
        state = state.replace(obs=obs, reward=reward, done=done,
                              fail_rates=fail_rates,
                              reward_components=comps,
                              tracking_error=track_err)

        # masked reset of done envs
        rng, sub = jax.random.split(state.rng)
        n = state.done.shape[0]
        if reset_pool is not None:
            r_sim, r_ids, r_times, r_obs = _pool_take(reset_pool, pool_slot,
                                                      n)
        else:
            r_ids, r_times, r_sim = self._sample_reset(lib, sub, n,
                                                       fail_rates)
            r_obs = self._compute_obs(
                lib, self._obs_view(r_sim, r_ids, r_times))
        reset_state = state.replace(
            sim=r_sim, motion_ids=r_ids, motion_times=r_times,
            start_times=r_times, time=jnp.zeros_like(time), rng=rng,
            obs=r_obs)

        def sel(a, b):
            mask = is_done.reshape(is_done.shape
                                   + (1,) * (a.ndim - is_done.ndim))
            return jnp.where(mask, a, b)

        # masked select only over the per-env fields; stats/rng are global
        return state.replace(
            sim=jax.tree.map(sel, reset_state.sim, state.sim),
            obs=sel(reset_state.obs, state.obs),
            motion_ids=sel(reset_state.motion_ids, state.motion_ids),
            motion_times=sel(reset_state.motion_times, state.motion_times),
            start_times=sel(reset_state.start_times, state.start_times),
            time=sel(reset_state.time, state.time),
            # done/reward/stats report the pre-reset values; the pre-reset
            # obs is kept for terminal bootstrapping
            done=done, reward=reward, rng=rng, terminal_obs=obs,
            terminal_times=time,
            fail_rates=fail_rates, reward_components=comps,
            tracking_error=track_err)
