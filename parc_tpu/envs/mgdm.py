"""MGDM env: MDM-in-the-loop reference generation for tracker training.

Instead of replaying dataset clips, the reference motions are periodically
*generated* by the motion diffusion model on a procedurally generated
terrain: every ``plan_seconds`` all envs synchronously replan — one batched
MDM call produces the next reference window for every env, conditioned on
the current reference state and a random xy target.

Reference parity: envs/ig_parkour/mgdm_env.py:37-862 (synchronized replan
:575-826, procgen platform terrain :206-350, OOB termination :159-204,
random targets :430-474).

TPU design: the reference swaps in a fresh MotionLib each replan
(mgdm_env.py:769-773); here the generated references live in a fixed-shape
ring buffer (N, T, ...) that one jitted replan call overwrites — no
allocation, no retracing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from parc_tpu.anim import char_model as cm
from parc_tpu.diffusion import gen as gen_lib
from parc_tpu.diffusion.mdm import MDM, MDMState
from parc_tpu.envs import obs as obs_mod
from parc_tpu.envs.base import DoneFlags, EnvConfig
from parc_tpu.physics import engine
from parc_tpu.utils import rotation as rot
from parc_tpu.utils import terrain as terrain_lib


@dataclasses.dataclass(frozen=True)
class MGDMConfig:
    num_envs: int = 256
    plan_frames: int = 15            # frames per MDM window
    fps: float = 30.0
    target_radius: float = 3.0       # random target sampling radius
    min_target_dist: float = 1.0
    oob_z_low: float = -3.0          # out-of-bounds termination
    oob_z_high: float = 6.0
    ddim_stride: int = 20
    guidance_scale: float = 1.0


@struct.dataclass
class MGDMRefState:
    """Fixed-shape generated-reference buffer."""

    frames34: jax.Array     # (N, T, 34) world-frame reference window
    contacts: jax.Array     # (N, T, B)
    frame_idx: jax.Array    # (N,) current index into the window
    target_xy: jax.Array    # (N, 2) current xy goals


def make_platform_terrain(rng: np.random.Generator, dim: int = 64,
                          dx: float = 0.4) -> terrain_lib.Terrain:
    """Global procgen platform terrain (reference: mgdm_env.py:206-350)."""
    hf = np.zeros((dim, dim), np.float32)
    hf = terrain_lib.add_boxes(rng, hf, num_boxes=24, box_min_height=-0.5,
                               box_max_height=1.2, box_min_len=3,
                               box_max_len=10)
    half = dim * dx / 2
    t = terrain_lib.create_terrain(dim, dim, dx=dx, min_x=-half, min_y=-half)
    return t.replace(hf=jnp.asarray(hf))


class MGDMEnv:
    """Generated-reference tracking env.

    Host orchestration: call ``replan`` every ``plan_frames`` control steps
    (a single jitted batched MDM sampling call), and ``step`` (jitted)
    otherwise.  The reference does the same split — replans are the only
    host-synchronized boundary (SURVEY §7: host<->TPU traffic only at
    replan/reset boundaries).
    """

    def __init__(self, model: cm.CharModel, sim_params: engine.SimParams,
                 env_cfg: EnvConfig, mgdm_cfg: MGDMConfig, mdm: MDM,
                 terrain: terrain_lib.Terrain):
        self.model = model
        self.sim_params = sim_params
        self.cfg = env_cfg
        self.mcfg = mgdm_cfg
        self.mdm = mdm
        # host numpy leaves: the terrain is a closed-over constant of the
        # jitted step/replan; device constants would stall remote lowering
        self.terrain = jax.tree.map(np.asarray, terrain)
        names = list(model.body_names)
        self.key_body_ids = jnp.asarray(
            [names.index(n) for n in env_cfg.key_bodies], jnp.int32)

    # ------------------------------------------------------------------
    def _ref_frame(self, ref: MGDMRefState):
        """Current reference pose from the buffer."""
        idx = jnp.clip(ref.frame_idx, 0, self.mcfg.plan_frames - 1)
        f = ref.frames34[jnp.arange(ref.frames34.shape[0]), idx]
        c = ref.contacts[jnp.arange(ref.contacts.shape[0]), idx]
        return f, c

    def _sample_targets(self, rng, root_xy):
        ang = jax.random.uniform(rng, root_xy.shape[:-1]) * 2 * jnp.pi
        rad = self.mcfg.min_target_dist + jax.random.uniform(
            jax.random.fold_in(rng, 1), root_xy.shape[:-1]) * (
                self.mcfg.target_radius - self.mcfg.min_target_dist)
        tgt = root_xy + jnp.stack(
            [jnp.cos(ang) * rad, jnp.sin(ang) * rad], axis=-1)
        lo = self.terrain.min_point + 2 * self.terrain.dxdy
        hi = self.terrain.max_point - 2 * self.terrain.dxdy
        return jnp.clip(tgt, lo, hi)

    # ------------------------------------------------------------------
    def init_refs(self, rng: jax.Array, n: int) -> MGDMRefState:
        """Standing references at random spawn points on the terrain."""
        k_pos, k_tgt = jax.random.split(rng)
        lo = self.terrain.min_point + 4 * self.terrain.dxdy
        hi = self.terrain.max_point - 4 * self.terrain.dxdy
        xy = lo + jax.random.uniform(k_pos, (n, 2)) * (hi - lo)
        ground = terrain_lib.get_hf_val(self.terrain, xy)
        t_len = self.mcfg.plan_frames
        frames = jnp.zeros((n, t_len, 34))
        frames = frames.at[..., 0:2].set(xy[:, None, :])
        frames = frames.at[..., 2].set(ground[:, None] + 0.94)
        contacts = jnp.zeros((n, t_len, self.model.num_bodies))
        contacts = contacts.at[..., 11].set(1.0).at[..., 14].set(1.0)
        return MGDMRefState(frames34=frames, contacts=contacts,
                            frame_idx=jnp.zeros((n,), jnp.int32),
                            target_xy=self._sample_targets(k_tgt, xy))

    def replan(self, mdm_state: MDMState, ref: MGDMRefState,
               rng: jax.Array) -> MGDMRefState:
        """Synchronized batched replan: generate the next window for every
        env from the last two reference frames."""
        n = ref.frames34.shape[0]
        k_gen, k_tgt = jax.random.split(rng)
        prev = ref.frames34[:, -2:]
        prev_c = ref.contacts[:, -2:]
        new_frames, new_contacts = gen_lib.gen_mdm_motion(
            self.mdm, mdm_state, k_gen, prev, prev_c, self.terrain,
            ref.target_xy,
            settings=gen_lib.GenSettings(
                ddim_stride=self.mcfg.ddim_stride,
                guidance_scale=self.mcfg.guidance_scale))
        root_xy = new_frames[:, -1, 0:2]
        # re-target envs that reached their goals
        reached = (jnp.linalg.norm(ref.target_xy - root_xy, axis=-1)
                   < 0.75)
        new_targets = self._sample_targets(k_tgt, root_xy)
        target_xy = jnp.where(reached[:, None], new_targets, ref.target_xy)
        return MGDMRefState(
            frames34=new_frames[:, :self.mcfg.plan_frames],
            contacts=new_contacts[:, :self.mcfg.plan_frames],
            frame_idx=jnp.zeros((n,), jnp.int32),
            target_xy=target_xy)

    # ------------------------------------------------------------------
    def reset(self, ref: MGDMRefState, rng: jax.Array):
        f, _ = self._ref_frame(ref)
        root_pos = f[:, 0:3].at[:, 2].add(self.cfg.ref_height_buffer)
        root_rot = rot.exp_map_to_quat(f[:, 3:6])
        joint_rot = cm.dof_to_rot(self.model, f[:, 6:])
        sim = engine.create_state(self.model, root_pos, root_rot, joint_rot)
        return sim

    def step(self, sim: engine.SimState, ref: MGDMRefState,
             actions: jax.Array):
        """One control step against the generated reference."""
        cfg = self.cfg
        sim = engine.control_step(
            self.model, self.sim_params, self.terrain, sim, actions,
            sim_steps=cfg.sim_steps_per_control)
        ref = ref.replace(frame_idx=jnp.minimum(
            ref.frame_idx + 1, self.mcfg.plan_frames - 1))

        f, c = self._ref_frame(ref)
        ref_root_pos = f[:, 0:3]
        ref_root_rot = rot.exp_map_to_quat(f[:, 3:6])
        ref_joint_rot = cm.dof_to_rot(self.model, f[:, 6:])

        # reward: deepmimic pose/root terms against the generated frame
        pose_diff = rot.quat_diff_angle(sim.joint_rot, ref_joint_rot)
        pose_r = jnp.exp(-0.25 * jnp.sum(pose_diff**2, axis=-1)
                         / max(self.model.num_bodies - 1, 1))
        root_err = jnp.sum((ref_root_pos - sim.root_pos)**2, axis=-1)
        root_rot_err = rot.quat_diff_angle(sim.root_rot, ref_root_rot)**2
        root_r = jnp.exp(-5.0 * (root_err + 0.1 * root_rot_err))
        reward = cfg.pose_w * pose_r + (cfg.root_pos_w + cfg.root_vel_w
                                        + cfg.key_pos_w + cfg.vel_w) * root_r

        # termination: OOB or large tracking divergence
        z = sim.root_pos[..., 2]
        ground = terrain_lib.get_hf_val(self.terrain, sim.root_pos[..., 0:2])
        oob = ((z - ground < self.mcfg.oob_z_low)
               | (z - ground > self.mcfg.oob_z_high))
        diverged = root_err > cfg.root_pos_termination_dist**2 * 4
        done = jnp.where(oob | diverged, DoneFlags.FAIL, DoneFlags.NULL)
        return sim, ref, reward, done

    def hard_reset_mask(self, sim: engine.SimState, ref: MGDMRefState,
                        done: jax.Array):
        """Masked reset of failed envs back onto their reference."""
        need = done != DoneFlags.NULL
        f, _ = self._ref_frame(ref)
        root_pos = f[:, 0:3].at[:, 2].add(self.cfg.ref_height_buffer)
        root_rot = rot.exp_map_to_quat(f[:, 3:6])
        joint_rot = cm.dof_to_rot(self.model, f[:, 6:])
        fresh = engine.create_state(self.model, root_pos, root_rot,
                                    joint_rot)
        return engine.where_state(need, fresh, sim)
