"""Motion editing operations.

Mirror / resample / blend / slice / contact labeling / hesitation removal /
terrain-from-motion — the clip-processing toolbox of the kinematic
generation pipeline.

Reference parity: zmotion_editing_tools/motion_edit_lib.py:291-1319
(mirror :514-610, fps resample :1130, blend/stitch :326-433, contacts from
geometry :612-787, remove_hesitation :1242, terrain-from-motion :227-290).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_data as md
from parc_tpu.utils import rotation as rot
from parc_tpu.utils import terrain as terrain_lib


# ---------------------------------------------------------------------------
# Mirroring
# ---------------------------------------------------------------------------


def _mirror_pairs(model: cm.CharModel) -> List[Tuple[int, int]]:
    """(body_i, body_j) pairs swapped by a left-right mirror."""
    pairs = []
    for i, name in enumerate(model.body_names):
        if name.startswith("left_"):
            other = "right_" + name[len("left_"):]
            if other in model.body_names:
                pairs.append((i, model.body_names.index(other)))
    return pairs


def flip_motion_about_xz(model: cm.CharModel,
                         frames34: jax.Array,
                         contacts: Optional[jax.Array] = None):
    """Mirror a motion about the XZ plane (left-right body swap).

    Rotation mirroring: conjugation by diag(1,-1,1) maps an exp-map
    (ex, ey, ez) -> (-ex, ey, -ez); root y negates.
    """
    frames34 = jnp.asarray(frames34)
    root_pos = frames34[..., 0:3] * jnp.asarray([1.0, -1.0, 1.0])
    root_em = frames34[..., 3:6] * jnp.asarray([-1.0, 1.0, -1.0])

    # per-joint exp maps -> mirror -> swap left/right -> back to dof
    em = cm.joint_exp_maps(model, frames34[..., 6:])  # (..., J-1, 3)
    em = em * jnp.asarray([-1.0, 1.0, -1.0])
    perm = np.arange(model.num_bodies - 1)
    for i, j in _mirror_pairs(model):
        perm[i - 1], perm[j - 1] = perm[j - 1], perm[i - 1]
    em = em[..., jnp.asarray(perm), :]
    dof = cm.project_to_dof(model, em)

    out = jnp.concatenate([root_pos, root_em, dof], axis=-1)
    if contacts is not None:
        cperm = np.arange(model.num_bodies)
        for i, j in _mirror_pairs(model):
            cperm[i], cperm[j] = cperm[j], cperm[i]
        contacts = jnp.asarray(contacts)[..., jnp.asarray(cperm)]
    return out, contacts


def flip_terrain_about_xz(t: md.HostTerrain) -> md.HostTerrain:
    """Mirror a heightfield about the XZ plane (flip the y/col axis)."""
    max_y = t.min_point[1] + (t.hf.shape[1] - 1) * t.dxdy[1]
    return md.HostTerrain(
        hf=t.hf[:, ::-1].copy(),
        min_point=np.asarray([t.min_point[0], -max_y]),
        dxdy=t.dxdy.copy(),
        hf_mask=None if t.hf_mask is None else t.hf_mask[:, ::-1].copy(),
        hf_maxmin=None if t.hf_maxmin is None
        else t.hf_maxmin[:, ::-1].copy())


# ---------------------------------------------------------------------------
# Temporal ops
# ---------------------------------------------------------------------------


def resample_fps(model: cm.CharModel, frames34: jax.Array, src_fps: float,
                 dst_fps: float) -> jax.Array:
    """Resample a (T, 34) motion to a new frame rate (slerp on rotations)."""
    frames34 = jnp.asarray(frames34)
    t_src = frames34.shape[0]
    duration = (t_src - 1) / src_fps
    t_dst = int(round(duration * dst_fps)) + 1
    times = jnp.linspace(0.0, duration, t_dst)
    fidx = times * src_fps
    i0 = jnp.clip(jnp.floor(fidx).astype(jnp.int32), 0, t_src - 1)
    i1 = jnp.minimum(i0 + 1, t_src - 1)
    blend = (fidx - i0)[:, None]

    pos = (1 - blend) * frames34[i0, 0:3] + blend * frames34[i1, 0:3]
    q0 = rot.exp_map_to_quat(frames34[i0, 3:6])
    q1 = rot.exp_map_to_quat(frames34[i1, 3:6])
    root_em = rot.quat_to_exp_map(rot.slerp(q0, q1, blend[:, 0]))
    jr0 = cm.dof_to_rot(model, frames34[i0, 6:])
    jr1 = cm.dof_to_rot(model, frames34[i1, 6:])
    dof = cm.rot_to_dof(model, rot.slerp(jr0, jr1, blend))
    return jnp.concatenate([pos, root_em, dof], axis=-1)


def slice_motion(motion: md.MotionData, start: int, end: int) -> md.MotionData:
    return md.MotionData(
        frames=motion.frames[start:end].copy(), fps=motion.fps,
        loop_mode=motion.loop_mode,
        contacts=None if motion.contacts is None
        else motion.contacts[start:end].copy(),
        terrain=motion.terrain,
        hf_mask_inds=None if motion.hf_mask_inds is None
        else motion.hf_mask_inds[start:end])


def blend_motions(model: cm.CharModel, frames_a: jax.Array,
                  frames_b: jax.Array, blend_frames: int) -> jax.Array:
    """Stitch b after a with a slerp crossfade over ``blend_frames``."""
    a_tail = frames_a[-blend_frames:]
    b_head = frames_b[:blend_frames]
    w = jnp.linspace(0.0, 1.0, blend_frames)[:, None]
    pos = (1 - w) * a_tail[:, 0:3] + w * b_head[:, 0:3]
    q = rot.slerp(rot.exp_map_to_quat(a_tail[:, 3:6]),
                  rot.exp_map_to_quat(b_head[:, 3:6]), w[:, 0])
    jr = rot.slerp(cm.dof_to_rot(model, a_tail[:, 6:]),
                   cm.dof_to_rot(model, b_head[:, 6:]), w)
    mid = jnp.concatenate([pos, rot.quat_to_exp_map(q),
                           cm.rot_to_dof(model, jr)], axis=-1)
    return jnp.concatenate(
        [frames_a[:-blend_frames], mid, frames_b[blend_frames:]], axis=0)


def remove_hesitation_frames(frames34: np.ndarray,
                             contacts: Optional[np.ndarray],
                             min_root_vel: float = 0.08,
                             fps: float = 30.0,
                             window: int = 15):
    """Drop stretches where the character barely moves (reference:
    zmotion_editing_tools/motion_edit_lib.py:1242)."""
    frames34 = np.asarray(frames34)
    vel = np.linalg.norm(np.diff(frames34[:, 0:2], axis=0), axis=-1) * fps
    vel = np.concatenate([vel, vel[-1:]])
    slow = vel < min_root_vel
    # only drop runs longer than `window`, keeping the first few frames
    keep = np.ones(len(frames34), bool)
    run_start = None
    for i, s in enumerate(slow):
        if s and run_start is None:
            run_start = i
        elif not s and run_start is not None:
            if i - run_start > window:
                keep[run_start + window // 3:i] = False
            run_start = None
    if run_start is not None and len(slow) - run_start > window:
        keep[run_start + window // 3:] = False
    out_c = None if contacts is None else np.asarray(contacts)[keep]
    return frames34[keep], out_c


# ---------------------------------------------------------------------------
# Contacts & terrain from motion
# ---------------------------------------------------------------------------


def compute_contacts(model: cm.CharModel, terrain: terrain_lib.Terrain,
                     frames34: jax.Array, eps: float = 0.04) -> jax.Array:
    """Label per-body contact flags from geometry: a body is in contact when
    any of its contact points is within eps of the heightfield surface."""
    frames34 = jnp.asarray(frames34)
    root_pos = frames34[..., 0:3]
    root_rot = rot.exp_map_to_quat(frames34[..., 3:6])
    joint_rot = cm.dof_to_rot(model, frames34[..., 6:])
    body_pos, body_rot = cm.forward_kinematics(model, root_pos, root_rot,
                                               joint_rot)
    bidx = model.contact_point_body
    pts = (body_pos[..., bidx, :]
           + rot.quat_rotate(body_rot[..., bidx, :],
                             jnp.broadcast_to(model.contact_point_offset,
                                              body_pos[..., bidx, :].shape)))
    ground = terrain_lib.get_hf_val(terrain, pts[..., 0:2])
    near = (pts[..., 2] - model.contact_point_radius - ground) < eps
    onehot = jax.nn.one_hot(bidx, model.num_bodies)
    per_body = jnp.einsum("pj,...p->...j", onehot,
                          near.astype(jnp.float32))
    return (per_body > 0).astype(jnp.float32)


def terrain_from_motion(model: cm.CharModel, frames34: np.ndarray,
                        dx: float = 0.4, padding: float = 1.0
                        ) -> md.HostTerrain:
    """Create a flat-floor terrain sized to a motion's footprint, with the
    floor at the motion's minimum body height."""
    frames34 = jnp.asarray(frames34)
    root_pos = frames34[..., 0:3]
    root_rot = rot.exp_map_to_quat(frames34[..., 3:6])
    joint_rot = cm.dof_to_rot(model, frames34[..., 6:])
    body_pos, _ = cm.forward_kinematics(model, root_pos, root_rot, joint_rot)
    pts = np.asarray(body_pos).reshape(-1, 3)
    lo = pts[:, 0:2].min(0) - padding
    hi = pts[:, 0:2].max(0) + padding
    dims = np.maximum(np.ceil((hi - lo) / dx).astype(int) + 1, 4)
    floor = float(pts[:, 2].min()) - 0.05
    return md.HostTerrain(
        hf=np.full((dims[0], dims[1]), floor, np.float32),
        min_point=lo.astype(np.float32),
        dxdy=np.asarray([dx, dx], np.float32))
