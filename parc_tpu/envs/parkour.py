"""Parkour env: the composed training environment (dm + mgdm envs).

Reference parity: envs/ig_parkour/ig_parkour_env.py:53-1719 — THE training
env. N envs are split into a ``dm`` fraction that tracks dataset clips on
their per-motion terrains (DeepMimicEnv) and an ``mgdm`` fraction whose
reference motion is *generated online* by the MDM on a shared procgen
terrain, with all mgdm envs replanning synchronously (mgdm_env.py:575-826).

TPU design (SURVEY §7):
* the generated references live in a fixed-shape ring buffer inside the
  env state — the reference swaps in a fresh MotionLib each replan
  (mgdm_env.py:769-773), which would retrace under jit;
* the replan (a batched MDM DDIM call) runs inside the jitted step under a
  ``lax.cond`` on a synchronized timer, so the PPO rollout scan stays one
  XLA program with zero host syncs;
* the mgdm terrain is appended to the MotionLib as a zero-weight terrain
  slot (ml.append_terrain_slot) so terrain lookup / fail-rate accounting
  reuse the per-motion machinery;
* the MDM parameters ride in a ``ParkourLib`` bundle next to the MotionLib
  (device data enters as a jit argument, never a closure).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_lib as ml
from parc_tpu.diffusion import gen as gen_lib
from parc_tpu.diffusion.mdm import MDM, MDMState
from parc_tpu.envs import obs as obs_mod
from parc_tpu.envs.base import DoneFlags, EnvConfig, EnvState
from parc_tpu.envs.deepmimic import DeepMimicEnv, ResetPool, _pool_take
from parc_tpu.physics import engine
from parc_tpu.utils import rotation as rot
from parc_tpu.utils import terrain as terrain_lib


@dataclasses.dataclass(frozen=True)
class ParkourConfig:
    """Composition config (reference: ig_parkour_env.py:65-67 env split +
    mgdm_env replan/target settings)."""

    mgdm_num: int = 0               # envs [N-mgdm_num, N) use the MDM
    plan_frames: int = 15           # generated window length (control steps)
    target_radius: float = 3.0
    min_target_dist: float = 1.0
    ddim_stride: int = 20
    guidance_scale: float = 1.0
    spawn_margin_cells: int = 4
    # out-of-bounds z termination for mgdm rows (generated references can
    # wander; reference: mgdm_env.py:159-204)
    oob_z_low: float = -3.0
    oob_z_high: float = 6.0


@struct.dataclass
class ParkourLib:
    """Device bundle passed wherever PPO passes `lib`."""

    lib: ml.MotionLib
    mdm_state: MDMState

    @property
    def num_motions(self) -> int:
        return self.lib.num_motions


@struct.dataclass
class ParkourResetPool(ResetPool):
    """ResetPool + fresh standing windows/targets for the mgdm rows
    (flattened [k*Nm])."""

    ref_frames34: jax.Array = None
    ref_contacts: jax.Array = None
    target_xy: jax.Array = None


@struct.dataclass
class ParkourState(EnvState):
    ref_frames34: jax.Array   # (Nm, T, 34) generated reference windows
    ref_contacts: jax.Array   # (Nm, T, B)
    target_xy: jax.Array      # (Nm, 2)
    replan_timer: jax.Array   # () steps until next synchronized replan
    # (Nm,) {0,1}: row's current window is a synthetic standing anchor
    # (spawn / post-reset) — the next replan drops the prev-state condition
    # for these rows (reference mgdm_env.py:644-645 sets use_prev_state
    # False for hard_reset_ids)
    ref_synthetic: jax.Array


def _buffer_frame(model: cm.CharModel, frames34: jax.Array,
                  contacts: jax.Array, times: jax.Array,
                  fps: float) -> ml.MotionFrame:
    """Sample a MotionFrame from a (N, T, 34) window buffer at ``times``
    (seconds; clamped). times may carry extra trailing axes (N, S...)."""
    t_len = frames34.shape[1]
    fidx = jnp.clip(times * fps, 0.0, t_len - 1)
    i0 = jnp.floor(fidx).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t_len - 1)
    blend = (fidx - i0)[..., None]
    n_idx = jnp.arange(frames34.shape[0])
    n_idx = n_idx.reshape((-1,) + (1,) * (times.ndim - 1))
    f0 = frames34[n_idx, i0]
    f1 = frames34[n_idx, i1]
    c = (1 - blend) * contacts[n_idx, i0] + blend * contacts[n_idx, i1]

    root_pos = (1 - blend) * f0[..., 0:3] + blend * f1[..., 0:3]
    q0 = rot.exp_map_to_quat(f0[..., 3:6])
    q1 = rot.exp_map_to_quat(f1[..., 3:6])
    root_rot = rot.slerp(q0, q1, blend[..., 0])
    j0 = cm.dof_to_rot(model, f0[..., 6:])
    j1 = cm.dof_to_rot(model, f1[..., 6:])
    joint_rot = rot.slerp(j0, j1, blend)

    # velocities: forward differences over the buffer at i0
    i0n = jnp.minimum(i0 + 1, t_len - 1)
    fa = frames34[n_idx, i0]
    fb = frames34[n_idx, i0n]
    root_vel = (fb[..., 0:3] - fa[..., 0:3]) * fps
    dq = rot.quat_diff(rot.exp_map_to_quat(fa[..., 3:6]),
                       rot.exp_map_to_quat(fb[..., 3:6]))
    root_ang_vel = rot.quat_to_exp_map(dq) * fps
    dof_vel_exp = cm.joint_exp_maps(
        model, fb[..., 6:] - fa[..., 6:])  # small-angle approx per frame
    dof_vel = cm.project_to_dof(model, dof_vel_exp) * fps

    return ml.MotionFrame(root_pos=root_pos, root_rot=root_rot,
                          root_vel=root_vel, root_ang_vel=root_ang_vel,
                          joint_rot=joint_rot, dof_vel=dof_vel,
                          contacts=c)


class ParkourEnv(DeepMimicEnv):
    """DeepMimicEnv with an MDM-driven env fraction."""

    def __init__(self, model: cm.CharModel, sim_params: engine.SimParams,
                 cfg: EnvConfig, pcfg: ParkourConfig, mdm: MDM,
                 mgdm_terrain: terrain_lib.Terrain):
        super().__init__(model, sim_params, cfg)
        assert 0 <= pcfg.mgdm_num <= cfg.num_envs
        self.pcfg = pcfg
        self.mdm = mdm
        self.mgdm_terrain = jax.tree.map(np.asarray, mgdm_terrain)
        n = cfg.num_envs
        self.n_dm = n - pcfg.mgdm_num
        mask = np.zeros((n,), bool)
        mask[self.n_dm:] = True
        self.mgdm_mask = mask                      # static numpy

    def local_shard(self, n_shards: int) -> "ParkourEnv":
        """Per-shard clone for shard_map data parallelism: both the env
        batch AND the mgdm fraction split across shards, so each shard
        runs its own local MDM replan (the reference trains the full
        parkour composition data-parallel the same way — every process
        owns a dm+mgdm slice, ig_parkour_env.py:53 + mp_optimizer.py:83-90).

        The global state must be laid out shard-major first
        (:meth:`shard_row_permutation`) so a contiguous P('data') split
        hands each shard ``[n_dm/D dm rows | mgdm_num/D mgdm rows]``."""
        assert self.cfg.num_envs % n_shards == 0, (
            f"num_envs {self.cfg.num_envs} not divisible by {n_shards}")
        assert self.pcfg.mgdm_num % n_shards == 0, (
            f"mgdm_num {self.pcfg.mgdm_num} not divisible by {n_shards}")
        cfg = dataclasses.replace(
            self.cfg, num_envs=self.cfg.num_envs // n_shards)
        pcfg = dataclasses.replace(
            self.pcfg, mgdm_num=self.pcfg.mgdm_num // n_shards)
        return ParkourEnv(self.model, self.sim_params, cfg, pcfg, self.mdm,
                          self.mgdm_terrain)

    def shard_row_permutation(self, n_shards: int) -> np.ndarray:
        """Env-row permutation from the global ``[dm... | mgdm...]`` layout
        to shard-major blocks ``[dm_0|mg_0, dm_1|mg_1, ...]``: after
        applying it, sharding the env batch on 'data' gives shard i the
        contiguous local layout the :meth:`local_shard` env expects.  The
        per-mgdm-row buffers (ref_frames34 & co, leading dim mgdm_num)
        already split correctly under P('data') and need no permutation."""
        nd, nm = self.n_dm, self.pcfg.mgdm_num
        assert nd % n_shards == 0 and nm % n_shards == 0
        dm = np.arange(nd).reshape(n_shards, -1)
        mg = nd + np.arange(nm).reshape(n_shards, -1)
        return np.concatenate([dm, mg], axis=1).reshape(-1)

    # -- lib plumbing ----------------------------------------------------
    def make_lib(self, lib: ml.MotionLib,
                 mdm_state: MDMState) -> ParkourLib:
        """Bundle a dataset lib (terrain slot appended) with MDM weights."""
        lib = ml.append_terrain_slot(lib, self.mgdm_terrain)
        return ParkourLib(lib=lib, mdm_state=mdm_state)

    @staticmethod
    def _unwrap(bundle):
        if isinstance(bundle, ParkourLib):
            # mgdm rows must not time out on the dummy slot's length
            lib = bundle.lib
            lib = lib.replace(lengths=lib.lengths.at[-1].set(1e9))
            return lib, bundle.mdm_state
        return bundle, None

    # -- mgdm helpers ------------------------------------------------------
    def _sample_targets(self, rng, root_xy):
        pcfg = self.pcfg
        ang = jax.random.uniform(rng, root_xy.shape[:-1]) * 2 * jnp.pi
        rad = pcfg.min_target_dist + jax.random.uniform(
            jax.random.fold_in(rng, 1), root_xy.shape[:-1]) * (
                pcfg.target_radius - pcfg.min_target_dist)
        tgt = root_xy + jnp.stack([jnp.cos(ang) * rad,
                                   jnp.sin(ang) * rad], axis=-1)
        t = self.mgdm_terrain
        m = 2 * t.dxdy
        return jnp.clip(tgt, t.min_point + m, t.max_point - m)

    def _standing_windows(self, rng, n):
        """Standing reference windows at random spawns on the terrain."""
        pcfg = self.pcfg
        t = self.mgdm_terrain
        m = pcfg.spawn_margin_cells * t.dxdy
        k_pos, k_tgt = jax.random.split(rng)
        xy = t.min_point + m + jax.random.uniform(k_pos, (n, 2)) * (
            t.max_point - t.min_point - 2 * m)
        ground = terrain_lib.get_hf_val(t, xy)
        frames = jnp.zeros((n, pcfg.plan_frames, 34))
        frames = frames.at[..., 0:2].set(xy[:, None, :])
        frames = frames.at[..., 2].set(ground[:, None] + 0.94)
        contacts = jnp.zeros((n, pcfg.plan_frames, self.model.num_bodies))
        foot_ids = [i for i, nm in enumerate(self.model.body_names)
                    if "foot" in nm]
        contacts = contacts.at[..., foot_ids].set(1.0)
        return frames, contacts, self._sample_targets(k_tgt, xy)

    def _replan(self, mdm_state: MDMState, state: ParkourState,
                rng: jax.Array) -> ParkourState:
        """Synchronized batched replan for the mgdm rows."""
        pcfg = self.pcfg
        k_gen, k_tgt = jax.random.split(rng)
        prev = state.ref_frames34[:, -2:]
        prev_c = state.ref_contacts[:, -2:]
        # rows whose window is a synthetic standing anchor generate
        # unconditioned on it (reference per-env use_prev_state); after
        # this replan every row holds a real generated window
        new_f, new_c = gen_lib.gen_mdm_motion(
            self.mdm, mdm_state, k_gen, prev, prev_c, self.mgdm_terrain,
            state.target_xy,
            settings=gen_lib.GenSettings(
                ddim_stride=pcfg.ddim_stride,
                guidance_scale=pcfg.guidance_scale),
            prev_state_mask=1.0 - state.ref_synthetic)
        root_xy = new_f[:, -1, 0:2]
        reached = jnp.linalg.norm(state.target_xy - root_xy, axis=-1) < 0.75
        target_xy = jnp.where(reached[:, None],
                              self._sample_targets(k_tgt, root_xy),
                              state.target_xy)
        # mgdm rows restart their window clock
        mt = state.motion_times.at[self.n_dm:].set(0.0)
        return state.replace(
            ref_frames34=new_f[:, :pcfg.plan_frames],
            ref_contacts=new_c[:, :pcfg.plan_frames],
            target_xy=target_xy, motion_times=mt,
            replan_timer=jnp.asarray(pcfg.plan_frames, jnp.int32),
            ref_synthetic=jnp.zeros_like(state.ref_synthetic))

    def _combined_ref(self, lib, state: ParkourState,
                      times: Optional[jax.Array] = None) -> ml.MotionFrame:
        """Reference frames: dataset lib for dm rows, buffer for mgdm rows.

        times defaults to state.motion_times; may carry a steps axis."""
        t = state.motion_times if times is None else times
        dm_ref = ml.calc_motion_frame(lib, jnp.broadcast_to(
            state.motion_ids.reshape(state.motion_ids.shape
                                     + (1,) * (t.ndim - 1)), t.shape), t)
        if self.pcfg.mgdm_num == 0:
            return dm_ref
        mg_ref = _buffer_frame(self.model, state.ref_frames34,
                               state.ref_contacts, t[self.n_dm:],
                               1.0 / self.cfg.control_dt)

        def sel(a, b):
            return jnp.concatenate([a[:self.n_dm], b], axis=0)
        return jax.tree.map(sel, dm_ref, mg_ref)

    # -- public API --------------------------------------------------------
    def reset(self, bundle, rng: jax.Array,
              num_envs: Optional[int] = None, motion_ids=None,
              start_times=None) -> ParkourState:
        lib, mdm_state = self._unwrap(bundle)
        n = num_envs or self.cfg.num_envs
        base = super().reset(lib, rng, num_envs=n, motion_ids=motion_ids,
                             start_times=start_times)
        nm = self.pcfg.mgdm_num
        rng, k_std = jax.random.split(base.rng)
        frames, contacts, targets = self._standing_windows(k_std, nm)
        fields = {f.name: getattr(base, f.name)
                  for f in dataclasses.fields(EnvState)}
        fields["rng"] = rng
        state = ParkourState(
            **fields,
            ref_frames34=frames, ref_contacts=contacts, target_xy=targets,
            replan_timer=jnp.asarray(1, jnp.int32),
            ref_synthetic=jnp.ones((nm,)))
        if nm == 0:
            return state
        # pin mgdm rows to the terrain slot and respawn them on the buffer
        slot = lib.num_motions - 1
        ids = state.motion_ids.at[self.n_dm:].set(slot)
        mt = state.motion_times.at[self.n_dm:].set(0.0)
        state = state.replace(motion_ids=ids, motion_times=mt,
                              start_times=mt)
        ref = self._combined_ref(lib, state)
        fresh = engine.create_state(
            self.model,
            root_pos=ref.root_pos.at[..., 2].add(self.cfg.ref_height_buffer),
            root_rot=ref.root_rot, joint_rot=ref.joint_rot,
            root_vel=ref.root_vel, root_ang_vel=ref.root_ang_vel,
            dof_vel=ref.dof_vel)
        sim = engine.where_state(
            jnp.asarray(self.mgdm_mask), fresh, state.sim)
        state = state.replace(sim=sim)
        obs0 = self._compute_obs_parkour(lib, state)
        return state.replace(obs=obs0, terminal_obs=obs0)

    def _parkour_view(self, sim, ids, times, frames, contacts,
                      targets) -> ParkourState:
        """Minimal ParkourState for _combined_ref / obs computation."""
        base = self._obs_view(sim, ids, times)
        pcfg = self.pcfg
        if frames is None:
            frames = jnp.zeros((0, pcfg.plan_frames, 34))
            contacts = jnp.zeros((0, pcfg.plan_frames,
                                  self.model.num_bodies))
            targets = jnp.zeros((0, 2))
        fields = {f.name: getattr(base, f.name)
                  for f in dataclasses.fields(EnvState)}
        return ParkourState(**fields, ref_frames34=frames,
                            ref_contacts=contacts, target_xy=targets,
                            replan_timer=jnp.asarray(1, jnp.int32),
                            ref_synthetic=jnp.ones((frames.shape[0],)))

    def _sample_reset_parkour(self, lib, rng: jax.Array, n: int,
                              fail_rates: jax.Array):
        """One full reset batch: dm rows resampled from the dataset, mgdm
        rows respawned on fresh standing windows; returns the states plus
        their observations (used by both the inline reset path and
        build_reset_pool)."""
        nm = self.pcfg.mgdm_num
        k_dm, k_mg = jax.random.split(rng)
        ids, times, sim = self._sample_reset(lib, k_dm, n, fail_rates)
        frames = contacts = targets = None
        if nm > 0:
            frames, contacts, targets = self._standing_windows(k_mg, nm)
            ids = ids.at[self.n_dm:].set(lib.num_motions - 1)
            times = times.at[self.n_dm:].set(0.0)
        view = self._parkour_view(sim, ids, times, frames, contacts,
                                  targets)
        if nm > 0:
            mg_ref = self._combined_ref(lib, view)
            fresh = engine.create_state(
                self.model,
                root_pos=mg_ref.root_pos.at[..., 2].add(
                    self.cfg.ref_height_buffer),
                root_rot=mg_ref.root_rot, joint_rot=mg_ref.joint_rot,
                root_vel=mg_ref.root_vel, root_ang_vel=mg_ref.root_ang_vel,
                dof_vel=mg_ref.dof_vel)
            sim = engine.where_state(jnp.asarray(self.mgdm_mask), fresh,
                                     sim)
            view = view.replace(sim=sim)
        obs = self._compute_obs_parkour(lib, view)
        return sim, ids, times, obs, frames, contacts, targets

    def build_reset_pool(self, bundle, rng: jax.Array,
                         fail_rates: jax.Array, n: int,
                         k: int = 4) -> ParkourResetPool:
        lib, _ = self._unwrap(bundle)
        outs = [self._sample_reset_parkour(lib, jax.random.fold_in(rng, c),
                                           n, fail_rates)
                for c in range(k)]

        def cat(i):
            if outs[0][i] is None:
                return None
            return jnp.concatenate([o[i] for o in outs], axis=0)

        return ParkourResetPool(
            sim=jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                             *[o[0] for o in outs]),
            motion_ids=cat(1), times=cat(2), obs=cat(3),
            ref_frames34=cat(4), ref_contacts=cat(5), target_xy=cat(6),
            k=k)

    def _compute_obs_parkour(self, lib, state: ParkourState) -> jax.Array:
        steps = jnp.asarray(self.cfg.tar_obs_steps, jnp.float32)
        times = state.motion_times[..., None] + steps * self.cfg.control_dt
        tar = self._combined_ref(lib, state, times)
        return super()._compute_obs(lib, state, tar=tar)

    def step(self, bundle, state: ParkourState,
             actions: jax.Array,
             reset_pool: Optional[ParkourResetPool] = None,
             pool_slot: Optional[jax.Array] = None) -> ParkourState:
        lib, mdm_state = self._unwrap(bundle)
        cfg = self.cfg
        nm = self.pcfg.mgdm_num

        # --- synchronized replan (mgdm rows only) -------------------------
        if nm > 0:
            rng, k_plan = jax.random.split(state.rng)
            state = state.replace(rng=rng,
                                  replan_timer=state.replan_timer - 1)
            state = jax.lax.cond(
                state.replan_timer <= 0,
                lambda s: self._replan(mdm_state, s, k_plan),
                lambda s: s, state)

        # --- physics -------------------------------------------------------
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
        state = state.replace(
            sim=sim, time=state.time + cfg.control_dt,
            motion_times=state.motion_times + cfg.control_dt)

        # --- reward / done / obs against combined reference ---------------
        ref = self._combined_ref(lib, state)
        ref_body_pos, ref_body_rot = cm.forward_kinematics(
            self.model, ref.root_pos, ref.root_rot, ref.joint_rot)
        reward, comps = self._compute_reward(state, ref, ref_body_pos)
        done = self._compute_done(lib, state, ref, ref_body_pos)
        if nm > 0:
            # OOB-z termination for mgdm rows (reference:
            # mgdm_env.py:159-204) — generated references can wander off
            # the terrain; kill envs far below/above the local ground
            z = sim.root_pos[self.n_dm:, 2]
            ground = terrain_lib.get_hf_val(
                jax.tree.map(jnp.asarray, self.mgdm_terrain),
                sim.root_pos[self.n_dm:, 0:2])
            oob = ((z - ground < self.pcfg.oob_z_low)
                   | (z - ground > self.pcfg.oob_z_high))
            mg_done = jnp.where(
                oob & (done[self.n_dm:] == DoneFlags.NULL),
                DoneFlags.FAIL, done[self.n_dm:])
            done = done.at[self.n_dm:].set(mg_done)
        track_err = self._tracking_error(state, ref, ref_body_pos,
                                         ref_body_rot)

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

        obs = self._compute_obs_parkour(lib, state)
        state = state.replace(obs=obs, reward=reward, done=done,
                              fail_rates=fail_rates,
                              reward_components=comps,
                              tracking_error=track_err)

        # --- masked reset ---------------------------------------------------
        rng, k_reset = jax.random.split(state.rng)
        n = state.done.shape[0]
        if reset_pool is not None:
            r_sim, r_ids, r_times, r_obs = _pool_take(reset_pool, pool_slot,
                                                      n)
            if nm > 0:
                idxm = pool_slot[self.n_dm:] * nm + jnp.arange(nm)
                takem = lambda a: jnp.take(a, idxm, axis=0)
                r_frames = takem(reset_pool.ref_frames34)
                r_contacts = takem(reset_pool.ref_contacts)
                r_targets = takem(reset_pool.target_xy)
        else:
            (r_sim, r_ids, r_times, r_obs, r_frames, r_contacts,
             r_targets) = self._sample_reset_parkour(lib, k_reset, n,
                                                     fail_rates)

        def sel(a, b):
            mask = is_done.reshape(is_done.shape
                                   + (1,) * (a.ndim - is_done.ndim))
            return jnp.where(mask, a, b)

        new_frames, new_contacts = state.ref_frames34, state.ref_contacts
        new_targets, new_synth = state.target_xy, state.ref_synthetic
        if nm > 0:
            mg_done = is_done[self.n_dm:]
            sel3 = mg_done.reshape((-1,) + (1,) * 2)
            new_frames = jnp.where(sel3, r_frames, state.ref_frames34)
            new_contacts = jnp.where(sel3, r_contacts, state.ref_contacts)
            new_targets = jnp.where(mg_done[:, None], r_targets,
                                    state.target_xy)
            # reset rows land on synthetic standing windows again
            new_synth = jnp.where(mg_done, 1.0, state.ref_synthetic)

        return state.replace(
            sim=jax.tree.map(sel, r_sim, state.sim),
            obs=sel(r_obs, state.obs),
            motion_ids=sel(r_ids, state.motion_ids),
            motion_times=sel(r_times, state.motion_times),
            start_times=sel(r_times, state.start_times),
            time=sel(jnp.zeros_like(state.time), state.time),
            ref_frames34=new_frames,
            ref_contacts=new_contacts,
            target_xy=new_targets,
            ref_synthetic=new_synth,
            replan_timer=state.replan_timer,
            done=done, reward=reward, rng=rng, terminal_obs=obs,
            terminal_times=state.time,
            fail_rates=fail_rates, reward_components=comps,
            tracking_error=track_err)
