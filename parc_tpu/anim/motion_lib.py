"""Motion library: batched reference-motion playback on device.

Loads a set of motion clips (plus optional per-motion terrains) into flat
static-shape device arrays and provides pure, jittable frame sampling with
slerp blending, CLAMP/WRAP looping, and weighted motion sampling — the JAX
equivalent of the reference's MotionLib (reference: anim/motion_lib.py:21-539).

Terrains are padded to common dimensions so per-motion terrain lookup is a
single gather inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_data as md
from parc_tpu.utils import gather as gather_lib
from parc_tpu.utils import rotation as rot
from parc_tpu.utils import terrain as terrain_lib

LOOP_CLAMP, LOOP_WRAP = 0, 1


@struct.dataclass
class MotionFrame:
    """A batch of sampled motion frames."""

    root_pos: jax.Array      # (..., 3)
    root_rot: jax.Array      # (..., 4)
    root_vel: jax.Array      # (..., 3)
    root_ang_vel: jax.Array  # (..., 3)
    joint_rot: jax.Array     # (..., J-1, 4)
    dof_vel: jax.Array       # (..., D)
    contacts: jax.Array      # (..., B)


@struct.dataclass
class MotionLib:
    # concatenated per-frame arrays (F = total frames over all motions)
    frame_root_pos: jax.Array      # (F, 3)
    frame_root_rot: jax.Array      # (F, 4)
    frame_root_vel: jax.Array      # (F, 3)
    frame_root_ang_vel: jax.Array  # (F, 3)
    frame_joint_rot: jax.Array     # (F, J-1, 4)
    frame_dof_vel: jax.Array       # (F, D)
    frame_contacts: jax.Array      # (F, B)
    # per-motion metadata
    start_idx: jax.Array       # (M,) int32
    num_frames: jax.Array      # (M,) int32
    lengths: jax.Array         # (M,) float  (num_frames-1)/fps
    fps: jax.Array             # (M,)
    loop_modes: jax.Array      # (M,) int32
    weights: jax.Array         # (M,) sampling weights (normalized)
    root_pos_delta: jax.Array  # (M, 3) xy displacement per loop (WRAP)
    # per-motion terrain, padded to common dims
    terrain_hf: jax.Array         # (M, Ht, Wt)
    terrain_maxmin: jax.Array     # (M, Ht, Wt, 2) augmentation max/min
    terrain_min_point: jax.Array  # (M, 2)
    terrain_dxdy: jax.Array       # (2,)

    @property
    def num_motions(self) -> int:
        return self.start_idx.shape[0]

    def motion_terrain(self, motion_id: jax.Array) -> terrain_lib.Terrain:
        """Per-motion Terrain view (single id -> Terrain pytree)."""
        hf = self.terrain_hf[motion_id]
        return terrain_lib.Terrain(
            hf=hf, hf_mask=jnp.zeros(hf.shape, bool),
            hf_maxmin=jnp.stack([hf + 3.0, hf - 3.0], -1),
            min_point=self.terrain_min_point[motion_id],
            dxdy=self.terrain_dxdy)


def build_motion_lib(model: cm.CharModel,
                     motions: Sequence[md.MotionData],
                     weights: Optional[Sequence[float]] = None,
                     dtype=jnp.float32) -> MotionLib:
    """Assemble a MotionLib from host motion clips.

    Velocity conventions match the reference loader (reference:
    anim/motion_lib.py:169-182): forward differences scaled by fps with the
    last frame repeated; angular velocity is the exp-map of the frame-to-
    frame quaternion difference (world frame, left-trivialized).
    """
    num_bodies = model.num_bodies
    rp, rr, rv, rav, jr, dv, ct = [], [], [], [], [], [], []
    starts, counts, lengths, fpss, loops, deltas = [], [], [], [], [], []
    hfs, maxmins, minpts, dxdys = [], [], [], []
    off = 0
    for m in motions:
        frames = jnp.asarray(m.frames, dtype)
        fps = float(m.fps)
        n = frames.shape[0]
        root_pos = frames[:, 0:3]
        root_rot = rot.exp_map_to_quat(frames[:, 3:6])
        joint_rot = rot.quat_pos(cm.dof_to_rot(model, frames[:, 6:]))

        root_vel = fps * (root_pos[1:] - root_pos[:-1])
        root_vel = jnp.concatenate([root_vel, root_vel[-1:]], 0)
        drot = rot.quat_diff(root_rot[:-1], root_rot[1:])
        root_ang_vel = fps * rot.quat_to_exp_map(drot)
        root_ang_vel = jnp.concatenate([root_ang_vel, root_ang_vel[-1:]], 0)
        dof_vel = cm.compute_frame_dof_vel(model, joint_rot, 1.0 / fps)

        contacts = (jnp.asarray(m.contacts, dtype) if m.contacts is not None
                    else jnp.zeros((n, num_bodies), dtype))

        rp.append(root_pos); rr.append(root_rot); rv.append(root_vel)
        rav.append(root_ang_vel); jr.append(joint_rot); dv.append(dof_vel)
        ct.append(contacts)
        starts.append(off); counts.append(n)
        lengths.append((n - 1) / fps); fpss.append(fps)
        loops.append(md.LOOP_MODES[m.loop_mode])
        delta = np.array(root_pos[-1] - root_pos[0])
        delta[2] = 0.0
        deltas.append(delta)
        off += n
        if m.terrain is not None:
            h = np.asarray(m.terrain.hf, np.float32)
            hfs.append(h)
            mm = (np.asarray(m.terrain.hf_maxmin, np.float32)
                  if m.terrain.hf_maxmin is not None
                  else np.stack([h + 3.0, h - 3.0], -1))
            maxmins.append(mm)
            minpts.append(np.asarray(m.terrain.min_point[:2], np.float32))
            dxdys.append(np.asarray(m.terrain.dxdy[:2], np.float32))
        else:
            hfs.append(np.zeros((2, 2), np.float32))
            maxmins.append(np.stack([np.full((2, 2), 3.0, np.float32),
                                     np.full((2, 2), -3.0, np.float32)], -1))
            minpts.append(np.asarray([-100.0, -100.0], np.float32))
            dxdys.append(np.asarray([0.4, 0.4], np.float32))

    # pad terrains to common dims (edge padding keeps borders walkable)
    ht = max(h.shape[0] for h in hfs)
    wt = max(h.shape[1] for h in hfs)
    hf_pad = np.stack([
        np.pad(h, ((0, ht - h.shape[0]), (0, wt - h.shape[1])), mode="edge")
        for h in hfs])
    mm_pad = np.stack([
        np.pad(m_, ((0, ht - m_.shape[0]), (0, wt - m_.shape[1]), (0, 0)),
               mode="edge")
        for m_ in maxmins])

    w = (np.asarray(weights, np.float64) if weights is not None
         else np.ones(len(motions)))
    w = w / w.sum()

    return MotionLib(
        frame_root_pos=jnp.concatenate(rp),
        frame_root_rot=jnp.concatenate(rr),
        frame_root_vel=jnp.concatenate(rv),
        frame_root_ang_vel=jnp.concatenate(rav),
        frame_joint_rot=jnp.concatenate(jr),
        frame_dof_vel=jnp.concatenate(dv),
        frame_contacts=jnp.concatenate(ct),
        start_idx=jnp.asarray(starts, jnp.int32),
        num_frames=jnp.asarray(counts, jnp.int32),
        lengths=jnp.asarray(lengths, dtype),
        fps=jnp.asarray(fpss, dtype),
        loop_modes=jnp.asarray(loops, jnp.int32),
        weights=jnp.asarray(w, dtype),
        root_pos_delta=jnp.asarray(np.stack(deltas), dtype),
        terrain_hf=jnp.asarray(hf_pad),
        terrain_maxmin=jnp.asarray(mm_pad),
        terrain_min_point=jnp.asarray(np.stack(minpts)),
        terrain_dxdy=jnp.asarray(dxdys[0]),
    )


def load_motion_lib(model: cm.CharModel, files: Sequence[str],
                    weights: Optional[Sequence[float]] = None) -> MotionLib:
    return build_motion_lib(
        model, [md.load_motion_data(f) for f in files], weights)


# ---------------------------------------------------------------------------
# Pure sampling functions
# ---------------------------------------------------------------------------


def sample_motions(lib: MotionLib, rng: jax.Array, n: int,
                   weights: Optional[jax.Array] = None) -> jax.Array:
    w = lib.weights if weights is None else weights
    return jax.random.categorical(rng, jnp.log(jnp.maximum(w, 1e-12)), shape=(n,))


def sample_time(lib: MotionLib, rng: jax.Array, motion_ids: jax.Array,
                truncate_time: Optional[float] = None) -> jax.Array:
    phase = jax.random.uniform(rng, motion_ids.shape)
    length = lib.lengths[motion_ids]
    if truncate_time is not None:
        length = jnp.maximum(length - truncate_time, 0.0)
    return phase * length


def calc_phase(lib: MotionLib, motion_ids: jax.Array,
               times: jax.Array) -> jax.Array:
    length = lib.lengths[motion_ids]
    phase = times / length
    wrap = lib.loop_modes[motion_ids] == LOOP_WRAP
    phase = jnp.where(wrap, phase - jnp.floor(phase), phase)
    return jnp.clip(phase, 0.0, 1.0)


def calc_frame_blend(lib: MotionLib, motion_ids: jax.Array,
                     times: jax.Array):
    num_frames = lib.num_frames[motion_ids]
    phase = calc_phase(lib, motion_ids, times)
    fidx = phase * (num_frames - 1).astype(phase.dtype)
    idx0 = jnp.floor(fidx).astype(jnp.int32)
    idx0 = jnp.minimum(idx0, num_frames - 1)
    idx1 = jnp.minimum(idx0 + 1, num_frames - 1)
    blend = fidx - idx0.astype(phase.dtype)
    start = lib.start_idx[motion_ids]
    return start + idx0, start + idx1, blend


def _loop_offset(lib: MotionLib, motion_ids: jax.Array,
                 times: jax.Array) -> jax.Array:
    wrap = lib.loop_modes[motion_ids] == LOOP_WRAP
    cycles = jnp.floor(times / lib.lengths[motion_ids])
    delta = lib.root_pos_delta[motion_ids]
    return jnp.where(wrap[..., None], cycles[..., None] * delta, 0.0)


# Frame-table row lookups dispatch between XLA's native gather and a
# one-hot MXU contraction (utils/gather.py rows_onehot). Native gathers
# lower to a serial scalar loop on TPU — for the tracker's (4096 envs x 6
# tar steps) lookup they dominate the whole observation pass (~1.2 ms) —
# while the one-hot contraction costs L*F*W MACs, so it only wins while the
# concatenated frame table is small. Measured on v5e @ L=24576 (4096 envs x
# 6 tar steps): F=540 0.71 vs 1.31 ms, F=2070 1.11 vs 1.54, F=4050 1.30 vs
# 1.72 (one-hot vs native) — still ahead at this cutoff, extrapolated flops
# cross over shortly past it. CPU keeps the native gather (fast there, and
# the big one-hot intermediates compile pathologically on the XLA CPU
# backend).
ONEHOT_MAX_FRAMES = 4096


def _use_onehot_rows(num_frames: int) -> bool:
    return (num_frames <= ONEHOT_MAX_FRAMES
            and jax.default_backend() != "cpu")


def calc_motion_frame(lib: MotionLib, motion_ids: jax.Array,
                      times: jax.Array) -> MotionFrame:
    """Sample blended motion frames at arbitrary times (fully vectorized).

    Reference parity: anim/motion_lib.py:80-112 (positions/rotations are
    slerp-blended; velocities and contacts come from the earlier frame /
    linear blend respectively)."""
    i0, i1, blend = calc_frame_blend(lib, motion_ids, times)
    if _use_onehot_rows(lib.frame_root_pos.shape[0]):
        f = lib.frame_root_pos.shape[0]
        oh0 = jax.nn.one_hot(i0.reshape(-1), f,
                             dtype=lib.frame_root_pos.dtype)
        oh1 = jax.nn.one_hot(i1.reshape(-1), f,
                             dtype=lib.frame_root_pos.dtype)
        take0 = lambda t: gather_lib.rows_onehot(t, i0, oh=oh0)
        take1 = lambda t: gather_lib.rows_onehot(t, i1, oh=oh1)
    else:
        take0 = lambda t: t[i0]
        take1 = lambda t: t[i1]
    b = blend[..., None]
    root_pos = ((1.0 - b) * take0(lib.frame_root_pos)
                + b * take1(lib.frame_root_pos))
    root_rot = rot.slerp(take0(lib.frame_root_rot),
                         take1(lib.frame_root_rot), blend)
    joint_rot = rot.slerp(take0(lib.frame_joint_rot),
                          take1(lib.frame_joint_rot), b)
    contacts = ((1.0 - b) * take0(lib.frame_contacts)
                + b * take1(lib.frame_contacts))
    root_pos = root_pos + _loop_offset(lib, motion_ids, times)
    return MotionFrame(
        root_pos=root_pos, root_rot=root_rot,
        root_vel=take0(lib.frame_root_vel),
        root_ang_vel=take0(lib.frame_root_ang_vel),
        joint_rot=joint_rot, dof_vel=take0(lib.frame_dof_vel),
        contacts=contacts)


def frames_34d(model: cm.CharModel, frame: MotionFrame) -> jax.Array:
    """MotionFrame -> the interchange 34-D representation."""
    return jnp.concatenate([
        frame.root_pos, rot.quat_to_exp_map(frame.root_rot),
        cm.rot_to_dof(model, frame.joint_rot)], axis=-1)


def append_terrain_slot(lib: MotionLib,
                        terrain: terrain_lib.Terrain) -> MotionLib:
    """Append one zero-weight dummy motion carrying ``terrain`` as its
    per-motion terrain (host-side).

    Used by the parkour composition env: MDM-driven envs pin their
    motion_id to this slot so terrain lookup / fail-rate accounting reuse
    the per-motion machinery while reference frames come from the
    generated ring buffer (reference swaps whole MotionLibs instead:
    envs/ig_parkour/mgdm_env.py:769-773).
    """
    hf_new = np.asarray(terrain.hf, np.float32)
    old_hf = np.asarray(lib.terrain_hf)
    old_mm = np.asarray(lib.terrain_maxmin)
    ht = max(old_hf.shape[1], hf_new.shape[0])
    wt = max(old_hf.shape[2], hf_new.shape[1])

    def pad2(h, a, b):
        return np.pad(h, ((0, a - h.shape[0]), (0, b - h.shape[1])),
                      mode="edge")

    hf_stack = np.stack([pad2(h, ht, wt) for h in old_hf] +
                        [pad2(hf_new, ht, wt)])
    mm_new = np.stack([hf_new + 3.0, hf_new - 3.0], -1)
    mm_stack = np.stack(
        [np.pad(m, ((0, ht - m.shape[0]), (0, wt - m.shape[1]), (0, 0)),
                mode="edge") for m in old_mm] +
        [np.pad(mm_new, ((0, ht - mm_new.shape[0]),
                         (0, wt - mm_new.shape[1]), (0, 0)), mode="edge")])

    f = int(np.asarray(lib.num_frames).sum())
    two = 2  # dummy frames (never sampled: weight 0, never a dm target)
    pad_frames = lambda x: jnp.concatenate(
        [x, jnp.zeros((two,) + x.shape[1:], x.dtype)])
    return lib.replace(
        frame_root_pos=pad_frames(lib.frame_root_pos),
        frame_root_rot=pad_frames(lib.frame_root_rot).at[-two:, 3].set(1.0),
        frame_root_vel=pad_frames(lib.frame_root_vel),
        frame_root_ang_vel=pad_frames(lib.frame_root_ang_vel),
        frame_joint_rot=pad_frames(lib.frame_joint_rot).at[-two:, :, 3]
        .set(1.0),
        frame_dof_vel=pad_frames(lib.frame_dof_vel),
        frame_contacts=pad_frames(lib.frame_contacts),
        start_idx=jnp.concatenate(
            [lib.start_idx, jnp.asarray([f], jnp.int32)]),
        num_frames=jnp.concatenate(
            [lib.num_frames, jnp.asarray([two], jnp.int32)]),
        lengths=jnp.concatenate([lib.lengths, jnp.asarray([1.0 / 30.0])]),
        fps=jnp.concatenate([lib.fps, jnp.asarray([30.0])]),
        loop_modes=jnp.concatenate(
            [lib.loop_modes, jnp.asarray([LOOP_CLAMP], jnp.int32)]),
        weights=jnp.concatenate([lib.weights, jnp.zeros((1,))]),
        root_pos_delta=jnp.concatenate(
            [lib.root_pos_delta, jnp.zeros((1, 3))]),
        terrain_hf=jnp.asarray(hf_stack),
        terrain_maxmin=jnp.asarray(mm_stack),
        terrain_min_point=jnp.concatenate(
            [lib.terrain_min_point,
             jnp.asarray(terrain.min_point, jnp.float32)[None, :2]]),
    )
