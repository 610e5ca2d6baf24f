"""MDM training-window sampler (fully jittable).

Samples 15-frame motion windows + 2 previous-state conditioning frames,
canonicalizes them to the heading frame of the last previous frame,
extracts the 31x31 local heightfield, applies motion-aware heightfield
augmentation (only where the motion's hf_maxmin allows), and samples a
future xy-direction target.

Reference parity: diffusion/mdm_heightfield_contact_motion_sampler.py:30-574.
The reference does this on host tensors per batch; here the whole pipeline
is a pure function of (MotionLib, rng) that fuses into the training step.

Frame features (91-D, reference: diffusion/mdm.py:329-364 +
PARC/train_gen_default.yaml features):
  [ root_pos(3) | root_rot exp-map(3) | joint body pos(14*3) |
    joint dof(28) | contacts(15) ]
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_lib as ml
from parc_tpu.utils import rotation as rot


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    seq_len: int = 15
    num_prev_states: int = 2
    fps: float = 30.0
    # local heightfield (reference: train_gen_default.yaml heightmap:)
    hf_num_x_neg: int = 10
    hf_num_x_pos: int = 20
    hf_num_y: int = 15
    hf_dx: float = 0.2
    max_h: float = 3.0
    # future target (XY_DIR)
    future_window_min: float = 0.4
    future_window_max: float = 1.5
    target_dir_len_eps: float = 0.1
    future_pos_noise_scale: float = 0.05
    # augmentation
    use_hf_augmentation: bool = True
    hf_maxpool_chance: float = 0.15
    hf_max_maxpool_size: int = 10
    max_num_boxes: int = 4
    box_min_len: int = 2
    box_max_len: int = 12
    hf_change_height_chance: float = 0.1
    # conditioning noise
    angle_noise_scale: float = 0.01
    pos_noise_scale: float = 0.01

    @property
    def hf_dim_x(self) -> int:
        return self.hf_num_x_neg + self.hf_num_x_pos + 1

    @property
    def hf_dim_y(self) -> int:
        return 2 * self.hf_num_y + 1

    @property
    def total_frames(self) -> int:
        return self.seq_len + self.num_prev_states

    def frame_dim(self, model: cm.CharModel) -> int:
        nb = model.num_bodies
        return 3 + 3 + 3 * (nb - 1) + model.dof_size + nb


@struct.dataclass
class WindowBatch:
    """One sampled training batch."""

    frames: jax.Array        # (B, seq_len, frame_dim) canonical, to denoise
    prev_states: jax.Array   # (B, num_prev, frame_dim)
    hf: jax.Array            # (B, 31, 31) canonical local heightfield
    target_dir: jax.Array    # (B, 2)
    # canonical-frame metadata for losses
    canon_heading: jax.Array  # (B,)
    canon_xy: jax.Array       # (B, 2)
    canon_z: jax.Array        # (B,)
    motion_ids: jax.Array     # (B,)


def _features(model: cm.CharModel, frame: ml.MotionFrame,
              canon_xy, canon_z, canon_heading_inv) -> jax.Array:
    """Canonicalized 91-D features for a batch of frames (..., T)."""
    root_pos = frame.root_pos - jnp.concatenate(
        [canon_xy, canon_z[..., None]], -1)[..., None, :]
    root_pos = root_pos.at[..., 0:2].set(
        rot.rotate_2d_vec(root_pos[..., 0:2], canon_heading_inv[..., None]))
    root_rot = rot.quat_mul(
        rot.heading_to_quat(canon_heading_inv)[..., None, :], frame.root_rot)
    body_pos, _ = cm.forward_kinematics(model, root_pos, root_rot,
                                        frame.joint_rot)
    joint_pos = body_pos[..., 1:, :] - root_pos[..., None, :]
    dof = cm.rot_to_dof(model, frame.joint_rot)
    return jnp.concatenate([
        root_pos,
        rot.quat_to_exp_map(root_rot),
        joint_pos.reshape(joint_pos.shape[:-2] + (-1,)),
        dof,
        frame.contacts,
    ], axis=-1)


def split_features(model: cm.CharModel, x: jax.Array):
    """Inverse index map of the 91-D feature vector."""
    nb = model.num_bodies
    i0 = 3
    i1 = i0 + 3
    i2 = i1 + 3 * (nb - 1)
    i3 = i2 + model.dof_size
    return dict(root_pos=x[..., 0:i0], root_rot=x[..., i0:i1],
                joint_pos=x[..., i1:i2], dof=x[..., i2:i3],
                contacts=x[..., i3:])


def _local_hf_points(cfg: SamplerConfig, canon_xy, canon_heading):
    """World xy of the canonical local grid (B, X, Y, 2)."""
    xs = (jnp.arange(cfg.hf_dim_x) - cfg.hf_num_x_neg) * cfg.hf_dx
    ys = (jnp.arange(cfg.hf_dim_y) - cfg.hf_num_y) * cfg.hf_dx
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    pts = jnp.stack([gx, gy], -1)  # (X, Y, 2)
    c = jnp.cos(canon_heading)[..., None, None]
    s = jnp.sin(canon_heading)[..., None, None]
    wx = c * pts[..., 0] - s * pts[..., 1]
    wy = s * pts[..., 0] + c * pts[..., 1]
    return jnp.stack([wx, wy], -1) + canon_xy[..., None, None, :]


def _gather_terrain(lib: ml.MotionLib, motion_ids, pts_xy):
    """Nearest-cell gathers of hf and hf_maxmin at world points."""
    mp = lib.terrain_min_point[motion_ids][..., None, None, :]
    inds = jnp.round((pts_xy - mp) / lib.terrain_dxdy).astype(jnp.int32)
    dims = jnp.asarray(lib.terrain_hf.shape[-2:])
    inds = jnp.clip(inds, 0, dims - 1)
    t = motion_ids[..., None, None]
    hf = lib.terrain_hf[t, inds[..., 0], inds[..., 1]]
    mm = lib.terrain_maxmin[t, inds[..., 0], inds[..., 1]]
    return hf, mm


def _augment_hf(cfg: SamplerConfig, rng, hf, hf_max, hf_min):
    """Motion-aware augmentation: maxpool passes + random boxes + height
    shifts, all clamped to [hf_min, hf_max] so cells the motion touched
    stay put (reference: sampler :365-407, terrain_util:2017-2047)."""
    b = hf.shape[0]
    k_pool, k_boxes, k_shift = jax.random.split(rng, 3)

    # up to 3 random maxpool passes, each randomly square / x-only / y-only
    # (reference shuffles [maxpool_hf, maxpool_hf_1d_x, maxpool_hf_1d_y],
    # sampler :377-382, terrain_util:1595-1622)
    def pool_pass(h, key):
        k1, k2, k3 = jax.random.split(key, 3)
        do = jax.random.uniform(k1, (b,)) < cfg.hf_maxpool_chance
        size = jax.random.randint(k2, (b,), 2, cfg.hf_max_maxpool_size + 1)
        kind = jax.random.randint(k3, (b,), 0, 3)
        # static max size window; emulate size via masked max v/ iota dist
        pooled = h
        for s in (2, 4, 8):
            for kk, win in ((0, (1, s, s)), (1, (1, s, 1)), (2, (1, 1, s))):
                p = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          win, (1, 1, 1), "SAME")
                sel = do & (size >= s) & (kind == kk)
                pooled = jnp.where(sel[:, None, None], p, pooled)
        return pooled

    for key in jax.random.split(k_pool, 3):
        hf = pool_pass(hf, key)
        hf = jnp.clip(hf, hf_min, hf_max)

    # random boxes
    x_ids = jax.lax.broadcasted_iota(jnp.int32, hf.shape, 1)
    y_ids = jax.lax.broadcasted_iota(jnp.int32, hf.shape, 2)
    keys = jax.random.split(k_boxes, cfg.max_num_boxes)
    for key in keys:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ij = jax.random.randint(k1, (b, 2), 0,
                                jnp.asarray(hf.shape[1:]))
        wl = jax.random.randint(k2, (b, 2), cfg.box_min_len,
                                cfg.box_max_len + 1)
        height = jax.random.uniform(k3, (b,), minval=-1.0, maxval=1.5)
        active = jax.random.uniform(k4, (b,)) < 0.5
        inside = ((x_ids >= ij[:, 0, None, None])
                  & (x_ids < (ij[:, 0] + wl[:, 0])[:, None, None])
                  & (y_ids >= ij[:, 1, None, None])
                  & (y_ids < (ij[:, 1] + wl[:, 1])[:, None, None]))
        new = jnp.clip(height[:, None, None], hf_min, hf_max)
        hf = jnp.where(inside & active[:, None, None], new, hf)

    # global height shift where free
    k1, k2 = jax.random.split(k_shift)
    do = jax.random.uniform(k1, (b,)) < cfg.hf_change_height_chance
    dh = jax.random.uniform(k2, (b,), minval=-0.6, maxval=0.6)
    hf = jnp.where(do[:, None, None],
                   jnp.clip(hf + dh[:, None, None], hf_min, hf_max), hf)
    return hf


def window_features(model: cm.CharModel, cfg: SamplerConfig,
                    lib: ml.MotionLib, motion_ids: jax.Array,
                    t0: jax.Array):
    """Deterministic canonicalized window features at given start times.

    Returns ((B, total_frames, frame_dim) features, (canon_xy, canon_z,
    canon_heading)). Shared by the stochastic training sampler and the
    exact whole-dataset statistics pass."""
    dt = 1.0 / cfg.fps
    total = cfg.total_frames
    offsets = jnp.arange(total) * dt  # (T,)
    times = t0[:, None] + offsets[None, :]
    ids = jnp.broadcast_to(motion_ids[:, None], times.shape)
    frame = ml.calc_motion_frame(lib, ids, times)

    # canonical frame: last prev state (index num_prev-1)
    ci = cfg.num_prev_states - 1
    canon_xy = frame.root_pos[:, ci, 0:2]
    canon_z = frame.root_pos[:, ci, 2]
    canon_heading = rot.calc_heading(frame.root_rot[:, ci])
    feats = _features(model, frame, canon_xy, canon_z, -canon_heading)
    return feats, (canon_xy, canon_z, canon_heading)


def sample_batch(model: cm.CharModel, cfg: SamplerConfig, lib: ml.MotionLib,
                 rng: jax.Array, batch_size: int,
                 augment: bool = True) -> WindowBatch:
    """Sample a canonicalized training batch (pure; jit/vmap-safe)."""
    k_m, k_t, k_f, k_fn, k_aug, k_n = jax.random.split(rng, 6)
    dt = 1.0 / cfg.fps
    total = cfg.total_frames

    motion_ids = ml.sample_motions(lib, k_m, batch_size)
    # window start (time of first prev state); keep window inside the clip
    window_dur = (total - 1) * dt
    max_start = jnp.maximum(lib.lengths[motion_ids] - window_dur, 0.0)
    t0 = jax.random.uniform(k_t, (batch_size,)) * max_start

    feats, (canon_xy, canon_z, canon_heading) = window_features(
        model, cfg, lib, motion_ids, t0)

    prev_states = feats[:, :cfg.num_prev_states]
    frames = feats[:, cfg.num_prev_states:]

    # local heightfield, relative to canonical root z
    pts = _local_hf_points(cfg, canon_xy, canon_heading)
    hf, mm = _gather_terrain(lib, motion_ids, pts)
    hf_max, hf_min = mm[..., 0], mm[..., 1]
    if augment and cfg.use_hf_augmentation:
        hf = _augment_hf(cfg, k_aug, hf, hf_max, hf_min)
    hf = jnp.clip(hf - canon_z[:, None, None], -cfg.max_h, cfg.max_h)

    # future xy-direction target
    fut_dt = jax.random.uniform(
        k_f, (batch_size,), minval=cfg.future_window_min,
        maxval=cfg.future_window_max)
    fut_time = t0 + window_dur + fut_dt
    fut = ml.calc_motion_frame(lib, motion_ids, fut_time)
    fut_xy = fut.root_pos[..., 0:2]
    fut_xy = fut_xy + cfg.future_pos_noise_scale * jax.random.normal(
        k_fn, fut_xy.shape)
    delta = rot.rotate_2d_vec(fut_xy - canon_xy, -canon_heading)
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    target_dir = jnp.where(norm > cfg.target_dir_len_eps,
                           delta / jnp.maximum(norm, 1e-6),
                           jnp.zeros_like(delta))

    return WindowBatch(frames=frames, prev_states=prev_states, hf=hf,
                       target_dir=target_dir, canon_heading=canon_heading,
                       canon_xy=canon_xy, canon_z=canon_z,
                       motion_ids=motion_ids)


def compute_feature_stats(model: cm.CharModel, cfg: SamplerConfig,
                          lib: ml.MotionLib, rng: jax.Array,
                          num_samples: int = 4096):
    """Per-frame-slot mean/std over sampled windows — fast Monte-Carlo
    variant for tests/tiny runs; training uses the exact pass below."""
    batch = sample_batch(model, cfg, lib, rng, num_samples, augment=False)
    x = jnp.concatenate([batch.prev_states, batch.frames], axis=1)
    mean = jnp.mean(x, axis=0)
    std = jnp.maximum(jnp.std(x, axis=0), 1e-3)
    return mean, std  # (total_frames, frame_dim)


def compute_feature_stats_exact(model: cm.CharModel, cfg: SamplerConfig,
                                lib: ml.MotionLib, chunk: int = 8192):
    """EXACT per-frame-slot mean/std over every window of every motion
    (reference: diffusion/mdm.py:480-548) — deterministic, no run-to-run
    standardization jitter.

    Windows start on the uniform dt = 1/cfg.fps grid; each motion with
    length L contributes floor((L - window_dur)/dt) + 1 windows (min 1).
    Accumulated in jitted fixed-size chunks (weighted so padding rows do
    not contribute).
    """
    import numpy as np
    dt = 1.0 / cfg.fps
    window_dur = (cfg.total_frames - 1) * dt
    lengths = np.asarray(lib.lengths)
    counts = np.maximum(
        np.floor((lengths - window_dur) / dt + 1e-6).astype(np.int64) + 1, 1)
    motion_ids = np.repeat(np.arange(len(counts)), counts).astype(np.int32)
    t0 = (np.concatenate([np.arange(c) for c in counts]) * dt
          ).astype(np.float32)
    total_w = len(motion_ids)

    @jax.jit
    def chunk_moments(lib, ids, starts, w, shift):
        """Weighted sum of (x - shift) and (x - shift)^2 — centered second
        moments avoid f32 cancellation, so the result is chunk-size
        independent to float precision."""
        feats, _ = window_features(model, cfg, lib, ids, starts)
        feats = feats - shift
        w = w[:, None, None]
        return (jnp.sum(feats * w, axis=0),
                jnp.sum(jnp.square(feats) * w, axis=0))

    def chunks():
        for i in range(0, total_w, chunk):
            ids = motion_ids[i:i + chunk]
            starts = t0[i:i + chunk]
            n = len(ids)
            if n < chunk:  # pad to the static chunk shape
                ids = np.pad(ids, (0, chunk - n))
                starts = np.pad(starts, (0, chunk - n))
            w = (np.arange(chunk) < n).astype(np.float32)
            yield jnp.asarray(ids), jnp.asarray(starts), jnp.asarray(w)

    # pass 1: mean; pass 2: variance about the mean
    zero = jnp.zeros((cfg.total_frames, cfg.frame_dim(model)), jnp.float32)
    s = 0.0
    for ids, starts, w in chunks():
        s = s + chunk_moments(lib, ids, starts, w, zero)[0]
    mean = s / total_w
    ss = 0.0
    for ids, starts, w in chunks():
        ss = ss + chunk_moments(lib, ids, starts, w, mean)[1]
    std = jnp.maximum(jnp.sqrt(ss / total_w), 1e-3)
    return mean, std  # (total_frames, frame_dim)


def generate_ood_hfs(cfg: SamplerConfig, rng: jax.Array, batch: int,
                     center_z: jax.Array) -> jax.Array:
    """Synthetic out-of-distribution local heightfields: flat plane at the
    character's floor height plus random boxes, with the center 5x5 cells
    protected (reference: mdm_heightfield_contact_motion_sampler.py:490-524
    generate_hfs)."""
    hf = jnp.broadcast_to(center_z[:, None, None],
                          (batch, cfg.hf_dim_x, cfg.hf_dim_y))
    x_ids = jax.lax.broadcasted_iota(jnp.int32, hf.shape, 1)
    y_ids = jax.lax.broadcasted_iota(jnp.int32, hf.shape, 2)
    protected = ((jnp.abs(x_ids - cfg.hf_num_x_neg) <= 2)
                 & (jnp.abs(y_ids - cfg.hf_num_y) <= 2))
    for key in jax.random.split(rng, cfg.max_num_boxes):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ij = jax.random.randint(k1, (batch, 2), 0,
                                jnp.asarray(hf.shape[1:]))
        wl = jax.random.randint(k2, (batch, 2), cfg.box_min_len,
                                cfg.box_max_len + 1)
        height = jax.random.uniform(k3, (batch,), minval=-cfg.max_h,
                                    maxval=cfg.max_h)
        active = jax.random.uniform(k4, (batch,)) < 0.75
        inside = ((x_ids >= ij[:, 0, None, None])
                  & (x_ids < (ij[:, 0] + wl[:, 0])[:, None, None])
                  & (y_ids >= ij[:, 1, None, None])
                  & (y_ids < (ij[:, 1] + wl[:, 1])[:, None, None])
                  & ~protected)
        hf = jnp.where(inside & active[:, None, None],
                       center_z[:, None, None] + height[:, None, None], hf)
    return jnp.clip(hf, -cfg.max_h, cfg.max_h)
