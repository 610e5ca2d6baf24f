"""Observation kernels (pure JAX).

Behavioral parity with the reference's jitted obs kernels:
* char obs — envs/ig_char_env.py:581-626
* target obs — envs/ig_parkour/mgdm_dm_util.py:462-519
* heightfield ray obs — envs/ig_parkour/ig_parkour_env.py:139-155 +
  util/terrain_util.py:2049-2083

Layouts are described by an ``ObsLayout`` so agents can locate
non-normalized segments (heightfield + contacts), replacing the reference's
``ret_obs_shapes`` metadata (envs/ig_parkour/ig_parkour_env.py:1054-1244).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.utils import gather as gather_lib
from parc_tpu.utils import rotation as rot


@dataclasses.dataclass(frozen=True)
class ObsLayout:
    """Named segments of the flat observation vector."""

    names: Tuple[str, ...]
    sizes: Tuple[int, ...]
    normalized: Tuple[bool, ...]

    @property
    def total(self) -> int:
        return sum(self.sizes)

    def slices(self) -> Dict[str, slice]:
        out, off = {}, 0
        for n, s in zip(self.names, self.sizes):
            out[n] = slice(off, off + s)
            off += s
        return out

    def non_norm_mask(self) -> np.ndarray:
        mask = np.zeros(self.total, bool)
        off = 0
        for s, norm in zip(self.sizes, self.normalized):
            if not norm:
                mask[off:off + s] = True
            off += s
        return mask


def compute_char_obs(root_pos, root_rot, root_vel, root_ang_vel, joint_rot,
                     dof_vel, key_pos, global_obs: bool,
                     root_height_obs: bool) -> jax.Array:
    """Proprioceptive character observation (heading-local by default)."""
    heading_inv = rot.calc_heading_quat_inv(root_rot)
    if global_obs:
        root_rot_obs = rot.quat_to_tan_norm(root_rot)
        root_vel_obs = root_vel
        root_ang_vel_obs = root_ang_vel
    else:
        root_rot_obs = rot.quat_to_tan_norm(rot.quat_mul(heading_inv, root_rot))
        root_vel_obs = rot.quat_rotate(heading_inv, root_vel)
        root_ang_vel_obs = rot.quat_rotate(heading_inv, root_ang_vel)

    joint_obs = rot.quat_to_tan_norm(joint_rot)
    joint_obs = joint_obs.reshape(joint_obs.shape[:-2] + (-1,))

    parts = [root_rot_obs, root_vel_obs, root_ang_vel_obs, joint_obs, dof_vel]

    if key_pos.shape[-2] > 0:
        kp = key_pos - root_pos[..., None, :]
        if not global_obs:
            kp = rot.quat_rotate(heading_inv[..., None, :], kp)
        parts.append(kp.reshape(kp.shape[:-2] + (-1,)))

    if root_height_obs:
        parts = [root_pos[..., 2:3]] + parts

    return jnp.concatenate(parts, axis=-1)


def compute_tar_obs(ref_root_pos, ref_root_rot, tar_root_pos, tar_root_rot,
                    tar_joint_rot, tar_key_pos, global_obs: bool) -> jax.Array:
    """Future target-frame observation relative to the current root.

    Inputs carry a steps axis: tar_* are (..., S, ...).
    """
    root_pos_obs = tar_root_pos - ref_root_pos[..., None, :]
    if not global_obs:
        heading_inv = rot.calc_heading_quat_inv(ref_root_rot)[..., None, :]
        root_pos_obs = rot.quat_rotate(heading_inv, root_pos_obs)
        tar_root_rot = rot.quat_mul(
            jnp.broadcast_to(heading_inv, tar_root_rot.shape), tar_root_rot)

    rot_obs = rot.quat_to_tan_norm(tar_root_rot)
    joint_obs = rot.quat_to_tan_norm(tar_joint_rot)
    joint_obs = joint_obs.reshape(joint_obs.shape[:-2] + (-1,))

    parts = [root_pos_obs, rot_obs, joint_obs]
    if tar_key_pos.shape[-2] > 0:
        kp = tar_key_pos - tar_root_pos[..., None, :]
        if not global_obs:
            kp = rot.quat_rotate(heading_inv[..., None, :], kp)
            kp = kp + root_pos_obs[..., None, :]
        parts.append(kp.reshape(kp.shape[:-2] + (-1,)))
    obs = jnp.concatenate(parts, axis=-1)
    return obs.reshape(obs.shape[:-2] + (-1,))


def ray_sample_points(root_pos, root_rot, cfg) -> jax.Array:
    """World xy sample points of the configured terrain perception
    (``cfg.terrain_obs_mode``: HF_RAY cone / HF_GRID / HF_GRID_C2F;
    reference terrain_perception/perception_builder.py:10-19)."""
    from parc_tpu.envs import perception
    return perception.sample_points(root_pos, root_rot,
                                    perception.local_pattern(cfg))


def num_ray_points(cfg) -> int:
    from parc_tpu.envs import perception
    return perception.num_points(cfg)


def compute_hf_obs(hf_batch: jax.Array, min_point: jax.Array,
                   dxdy: jax.Array, terrain_idx: jax.Array,
                   points_xy: jax.Array, root_pos: jax.Array,
                   min_h: float, max_h: float) -> jax.Array:
    """Per-env heightfield lookups relative to root height.

    hf_batch: (M, H, W); terrain_idx: (N,) selects each env's terrain;
    points_xy: (N, P, 2).
    """
    mp = min_point[terrain_idx][..., None, :]
    inds = jnp.round((points_xy - mp) / dxdy).astype(jnp.int32)
    dims = jnp.asarray(hf_batch.shape[-2:])
    inds = jnp.clip(inds, 0, dims - 1)
    # one-hot MXU gather: 16x faster than the native gather at this scale
    h = gather_lib.batched_hf_gather(hf_batch, terrain_idx,
                                     inds[..., 0], inds[..., 1])
    rel = h - root_pos[..., 2:3]
    return jnp.clip(rel, min_h, max_h)
