"""MDM inference: world-frame <-> canonical-frame bridging + generation.

``gen_mdm_motion``-equivalent utilities (reference: diffusion/gen_util.py:
36-226): canonicalize the last prev frames to the heading frame, sample the
local heightfield from the world terrain, condition on an xy target
direction, run the (jitted) sampler, and un-canonicalize the result back to
world coordinates.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm
from parc_tpu.diffusion import sampler as sampler_lib
from parc_tpu.diffusion.mdm import MDM, MDMState
from parc_tpu.utils import rotation as rot
from parc_tpu.utils import terrain as terrain_lib


@dataclasses.dataclass(frozen=True)
class GenSettings:
    """Reference: diffusion/gen_util.py:12-34 (MDMGenSettings)."""

    ddim_stride: int = 5
    guidance_scale: float = 1.0
    use_ema: bool = True
    # condition on the prev-state frames (reference MDMGenSettings
    # use_prev_state, gen_util.py:13).  False drops the prev-state tokens
    # from attention entirely — the prev frames then only anchor the
    # canonical frame.  The reference uses this for the FIRST window of an
    # autoregressive chain (mdm_path.py:149-161): a synthetic standing
    # start pose must not condition the generation, or a well-fit model
    # keeps standing forever.
    use_prev_state: bool = True
    # optional gradient/hf guidance (parc_tpu.diffusion.guidance); None
    # disables (reference: gen_util.py:12-34 custom_guidance_params)
    guidance: object = None


def features_from_frames34(mdm: MDM, frames34: jax.Array,
                           contacts: jax.Array) -> jax.Array:
    """World/canonical 34-D frames + contacts -> 91-D features.

    (Assumes frames34 are already in the desired coordinate frame.)
    """
    model = mdm.model
    root_pos = frames34[..., 0:3]
    root_rot = rot.exp_map_to_quat(frames34[..., 3:6])
    joint_rot = cm.dof_to_rot(model, frames34[..., 6:])
    body_pos, _ = cm.forward_kinematics(model, root_pos, root_rot, joint_rot)
    joint_pos = body_pos[..., 1:, :] - root_pos[..., None, :]
    return jnp.concatenate([
        root_pos, frames34[..., 3:6],
        joint_pos.reshape(joint_pos.shape[:-2] + (-1,)),
        frames34[..., 6:], contacts], axis=-1)


def frames34_from_features(mdm: MDM, feats: jax.Array):
    """91-D features -> (frames34, contacts)."""
    f = sampler_lib.split_features(mdm.model, feats)
    frames34 = jnp.concatenate([f["root_pos"], f["root_rot"], f["dof"]],
                               axis=-1)
    return frames34, f["contacts"]


def canonicalize(frames34: jax.Array, canon_xy, canon_z, canon_heading):
    """World 34-D frames -> canonical frame of (xy, z, heading)."""
    out = frames34
    pos = out[..., 0:3] - jnp.concatenate(
        [canon_xy, canon_z[..., None]], -1)[..., None, :]
    pos = pos.at[..., 0:2].set(
        rot.rotate_2d_vec(pos[..., 0:2], -canon_heading[..., None]))
    em = rot.quat_to_exp_map(rot.quat_mul(
        rot.heading_to_quat(-canon_heading)[..., None, :],
        rot.exp_map_to_quat(out[..., 3:6])))
    return jnp.concatenate([pos, em, out[..., 6:]], axis=-1)


def uncanonicalize(frames34: jax.Array, canon_xy, canon_z, canon_heading):
    """Canonical 34-D frames -> world frame."""
    out = frames34
    pos = out[..., 0:3]
    xy = rot.rotate_2d_vec(pos[..., 0:2], canon_heading[..., None])
    pos = jnp.concatenate(
        [xy + canon_xy[..., None, :],
         (pos[..., 2] + canon_z[..., None])[..., None]], axis=-1)
    em = rot.quat_to_exp_map(rot.quat_mul(
        rot.heading_to_quat(canon_heading)[..., None, :],
        rot.exp_map_to_quat(out[..., 3:6])))
    return jnp.concatenate([pos, em, out[..., 6:]], axis=-1)


def sample_local_hf(mdm: MDM, terrain: terrain_lib.Terrain, canon_xy,
                    canon_z, canon_heading,
                    terrain_idx: Optional[jax.Array] = None) -> jax.Array:
    """Canonical 31x31 local heightfield from a world terrain.

    ``terrain`` is either one world terrain shared by every batch row
    (``hf (H, W)``) or a STACK of terrains (``hf (R, H, W)``,
    ``min_point (R, 2)`` or shared ``(2,)``) with ``terrain_idx (B,)``
    mapping each row to its terrain — the batched kin-gen path
    (procgen/mdm_path.generate_frames_multi) conditions R terrains'
    rollouts in one device program.  Both paths gather through the
    one-hot MXU contraction (utils/gather — native gathers serialize on
    TPU; one-hot rows are exact)."""
    from parc_tpu.utils import gather as gather_lib

    scfg = mdm.scfg
    pts = sampler_lib._local_hf_points(scfg, canon_xy, canon_heading)
    hf_t = jnp.asarray(terrain.hf)
    lead = pts.shape[:-1]                                  # (B, X, Y)
    if hf_t.ndim == 3:
        assert terrain_idx is not None, "stacked terrain needs terrain_idx"
        mp = jnp.asarray(terrain.min_point)
        if mp.ndim == 2:
            mp = mp[terrain_idx][..., None, None, :]
        inds = jnp.round((pts - mp) / terrain.dxdy).astype(jnp.int32)
        dims = jnp.asarray(hf_t.shape[-2:])
        inds = jnp.clip(inds, 0, dims - 1)
        flat = inds.reshape((inds.shape[0], -1, 2))        # (B, P, 2)
        hf = gather_lib.batched_hf_gather(
            hf_t, terrain_idx, flat[..., 0], flat[..., 1]).reshape(lead)
    else:
        inds = jnp.round((pts - terrain.min_point) / terrain.dxdy).astype(
            jnp.int32)
        dims = jnp.asarray(hf_t.shape)
        inds = jnp.clip(inds, 0, dims - 1)
        flat = inds.reshape((-1, inds.shape[-3] * inds.shape[-2], 2))
        hf = gather_lib.hf_gather_single(
            hf_t, flat[..., 0], flat[..., 1]).reshape(lead)
    return jnp.clip(hf - canon_z[..., None, None], -scfg.max_h, scfg.max_h)


def gen_mdm_motion(mdm: MDM, state: MDMState, rng: jax.Array,
                   prev_frames34: jax.Array, prev_contacts: jax.Array,
                   terrain: terrain_lib.Terrain, target_xy: jax.Array,
                   settings: GenSettings = GenSettings(),
                   prev_state_mask=None,
                   terrain_idx: Optional[jax.Array] = None):
    """Generate the next 15-frame window in world coordinates.

    Args:
      prev_frames34: (B, num_prev, 34) world-frame conditioning frames
        (last one is the canonical frame).
      prev_contacts: (B, num_prev, num_bodies).
      terrain: world terrain to condition on — one shared terrain, or a
        stacked ``hf (R, H, W)`` terrain with ``terrain_idx (B,)``
        mapping rows to terrains (see :func:`sample_local_hf`).
      target_xy: (B, 2) world-frame target position.
      prev_state_mask: optional per-env (B,) {0,1} mask overriding
        settings.use_prev_state — the reference's per-env use_prev_state
        tensor (mgdm_env.py:644-645): rows at 0 drop the prev-state
        condition (synthetic anchors after hard resets), rows at 1
        condition normally.  The prev frames still fix the canonical
        frame either way.

    Returns:
      (frames34 (B, 15, 34), contacts (B, 15, num_bodies)) world-frame
      window.
    """
    scfg = mdm.scfg
    canon = prev_frames34[:, -1]
    canon_xy = canon[:, 0:2]
    canon_z = canon[:, 2]
    canon_heading = rot.calc_heading(rot.exp_map_to_quat(canon[:, 3:6]))

    prev_canon = canonicalize(prev_frames34, canon_xy, canon_z,
                              canon_heading)
    prev_feats = features_from_frames34(mdm, prev_canon, prev_contacts)

    hf = sample_local_hf(mdm, terrain, canon_xy, canon_z, canon_heading,
                         terrain_idx=terrain_idx)

    delta = rot.rotate_2d_vec(target_xy - canon_xy, -canon_heading)
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    target_dir = jnp.where(norm > scfg.target_dir_len_eps,
                           delta / jnp.maximum(norm, 1e-6),
                           jnp.zeros_like(delta))

    target_xy_canon = rot.rotate_2d_vec(target_xy - canon_xy, -canon_heading)
    feats = mdm.ddim_sample(state, rng, prev_feats, hf, target_dir,
                            stride=settings.ddim_stride,
                            guidance_scale=settings.guidance_scale,
                            use_ema=settings.use_ema,
                            guidance=settings.guidance,
                            target_xy=target_xy_canon,
                            use_prev_state=(settings.use_prev_state
                                            if prev_state_mask is None
                                            else prev_state_mask))
    frames34_c, contacts = frames34_from_features(mdm, feats)
    frames34 = uncanonicalize(frames34_c, canon_xy, canon_z, canon_heading)
    return frames34, jnp.clip(jnp.round(contacts), 0.0, 1.0)
