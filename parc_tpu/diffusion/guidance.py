"""Sampling-time guidance for the MDM: gradient guidance on the predicted
clean signal, heightfield-optimizing guidance, and in-painting.

Reference parity: diffusion/mdm.py:1444-1542 (apply_guidance: target-xy /
hf-collision / speed-acc-jerk gradient steps on the denoised x0),
:1562-1651 (predict_x0_hf_guidance: 10 SGD+momentum steps optimizing the
conditioning heightfield itself, grads masked near the character and in
the target direction), :1544-1560 (apply_in_paint), and the default
weights/thresholds from diffusion/diffusion_util.py:38-57
(MDMCustomGuidance; jerk thresholds derived from dataset statistics via
tools/motion_tests/compute_stats.py).

TPU-first: each hook is a pure function on the standardized window; the
inner hf optimization is a ``lax.fori_loop`` so the whole sampler stays one
XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm
from parc_tpu.diffusion import sampler as sampler_lib
from parc_tpu.utils import rotation as rot


@dataclasses.dataclass(frozen=True)
class GuidanceParams:
    """Static guidance configuration (hashable: safe as a jit closure)."""

    guidance_str: float = 0.1
    # target-xy pull (reference: mdm.py:1474-1481)
    use_target: bool = False
    w_target: float = 1.0
    # heightfield penetration (reference: mdm.py:1489-1502)
    use_hf: bool = False
    w_hf: float = 10.0
    # derivative limits (reference: diffusion_util.py:49-57)
    guide_speed: bool = False
    guide_acc: bool = False
    guide_jerk: bool = False
    max_speed: float = 16.1498
    max_acc: float = 343.0243
    max_jerk: float = 14062.6680
    w_speed: float = 1.0 / 16.1498
    w_acc: float = 1.0 / 343.0243
    w_jerk: float = 1.0 / 14062.6680
    # strong hf guidance: optimize the heightfield itself
    strong_hf_guidance: bool = False
    hf_iters: int = 10
    hf_momentum: float = 0.9

    @property
    def active(self) -> bool:
        return (self.use_target or self.use_hf or self.guide_speed
                or self.guide_acc or self.guide_jerk)


def _fk_body_pos(model: cm.CharModel, feats):
    """FK body positions from split features (canonical frame)."""
    joint_rot = cm.dof_to_rot(model, feats["dof"])
    root_quat = rot.exp_map_to_quat(feats["root_rot"])
    body_pos, _ = cm.forward_kinematics(model, feats["root_pos"], root_quat,
                                        joint_rot)
    return body_pos  # (..., T, nb, 3)


def _body_contact_points(model: cm.CharModel, feats):
    """Character surface sample points in canonical coords (reference:
    util/geom_util.py:788-931 get_char_point_samples; here the contact
    point cloud baked into the char model)."""
    joint_rot = cm.dof_to_rot(model, feats["dof"])
    root_quat = rot.exp_map_to_quat(feats["root_rot"])
    body_pos, body_rot = cm.forward_kinematics(
        model, feats["root_pos"], root_quat, joint_rot)
    q = body_rot[..., model.contact_point_body, :]
    pts = body_pos[..., model.contact_point_body, :] + rot.quat_rotate(
        q, jnp.asarray(model.contact_point_offset))
    return pts  # (..., T, P, 3)


def _hf_at_points(mdm, hf: jax.Array, xy: jax.Array) -> jax.Array:
    """Nearest-cell height of the canonical local hf at canonical xy."""
    scfg = mdm.scfg
    bx = xy[..., 0] / scfg.hf_dx + scfg.hf_num_x_neg
    by = xy[..., 1] / scfg.hf_dx + scfg.hf_num_y
    ix = jnp.clip(jnp.round(bx).astype(jnp.int32), 0, scfg.hf_dim_x - 1)
    iy = jnp.clip(jnp.round(by).astype(jnp.int32), 0, scfg.hf_dim_y - 1)
    b_idx = jnp.arange(hf.shape[0])
    b_idx = b_idx.reshape((-1,) + (1,) * (ix.ndim - 1))
    return hf[b_idx, ix, iy]


def guidance_loss(mdm, state, x_std: jax.Array, hf: jax.Array,
                  target_xy: Optional[jax.Array],
                  gp: GuidanceParams) -> jax.Array:
    """Scalar guidance loss of a standardized window batch.

    x_std: (B, T, F) standardized frames; hf: (B, X, Y) canonical local
    heightfield (absolute heights, canonical z-relative); target_xy:
    (B, 2) canonical-frame target or None.
    """
    model = mdm.model
    x = mdm._unstandardize_frames(state, x_std)
    feats = sampler_lib.split_features(model, x)
    total = jnp.zeros(())

    if gp.use_target and target_xy is not None:
        diff = target_xy[:, None, :] - feats["root_pos"][..., 0:2]
        total = total + gp.w_target * 0.5 * jnp.sum(diff ** 2)

    need_fk = gp.use_hf or gp.guide_speed or gp.guide_acc or gp.guide_jerk
    if need_fk:
        if gp.use_hf:
            pts = _body_contact_points(model, feats)
            ground = _hf_at_points(mdm, hf, pts[..., 0:2])
            pen = jnp.minimum(pts[..., 2] - ground, 0.0)
            total = total + gp.w_hf * 0.5 * jnp.sum(pen ** 2)
        if gp.guide_speed or gp.guide_acc or gp.guide_jerk:
            body_pos = _fk_body_pos(model, feats)
            dt = 1.0 / mdm.scfg.fps
            # eps-guarded norms: linalg.norm has a NaN gradient at
            # exactly zero, and static predictions hit zero vel/acc/jerk
            def _mag(x):
                return jnp.sqrt(jnp.sum(x ** 2, axis=-1) + 1e-12)

            vel = body_pos[:, 1:] - body_pos[:, :-1]
            if gp.guide_speed:
                total = total + gp.w_speed * jnp.sum(
                    jnp.maximum(_mag(vel) - gp.max_speed * dt, 0.0))
            acc = vel[:, 1:] - vel[:, :-1]
            if gp.guide_acc:
                total = total + gp.w_acc * jnp.sum(
                    jnp.maximum(_mag(acc) - gp.max_acc * dt ** 2, 0.0))
            if gp.guide_jerk:
                jerk = acc[:, 1:] - acc[:, :-1]
                total = total + gp.w_jerk * jnp.sum(
                    jnp.maximum(_mag(jerk) - gp.max_jerk * dt ** 3, 0.0))
    return total


def apply_guidance(mdm, state, x_std: jax.Array, hf: jax.Array,
                   target_xy: Optional[jax.Array],
                   gp: GuidanceParams) -> jax.Array:
    """One gradient step on the (standardized) denoised window
    (reference: mdm.py:1444-1542 applied to predicted x0)."""
    if not gp.active:
        return x_std
    grad = jax.grad(
        lambda xs: guidance_loss(mdm, state, xs, hf, target_xy, gp))(x_std)
    return x_std - gp.guidance_str * grad


def apply_inpaint(x_std: jax.Array, paint_std: jax.Array,
                  mask: jax.Array) -> jax.Array:
    """Overwrite masked frames with fixed (standardized) values each
    denoise step (reference: mdm.py:1544-1560 pins the final frame).

    mask: (T,) or (B, T) boolean — True = replace with paint_std.
    """
    m = mask[..., None].astype(x_std.dtype)
    return m * paint_std + (1.0 - m) * x_std


def hf_guidance_x0(mdm, params, state, x_t, t_batch, prev_std, hf,
                   target_dir, target_xy, gp: GuidanceParams,
                   use_prev_state: bool = True):
    """Strong hf guidance: optimize the conditioning heightfield so the
    denoised motion satisfies target/collision objectives, grads masked
    out near the character and in the target direction
    (reference: mdm.py:1562-1651, SGD momentum 0.9, 10 iters).

    Returns (x0_std, optimized hf).
    """
    scfg = mdm.scfg

    # cells that must not move: around the character and toward the target
    xs = (jnp.arange(scfg.hf_dim_x) - scfg.hf_num_x_neg) * scfg.hf_dx
    ys = (jnp.arange(scfg.hf_dim_y) - scfg.hf_num_y) * scfg.hf_dx
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    near = (jnp.abs(gx) < 3 * scfg.hf_dx) & (jnp.abs(gy) < 3 * scfg.hf_dx)
    if target_xy is not None:
        dot = (gx[None] * target_xy[:, 0, None, None]
               + gy[None] * target_xy[:, 1, None, None])
        frozen = near[None] | (dot > 0)
    else:
        frozen = jnp.broadcast_to(near[None], hf.shape)
    grad_mask = 1.0 - frozen.astype(hf.dtype)

    def obj(hf_cur):
        x0 = mdm._denoise(params, state, x_t, t_batch, prev_std, hf_cur,
                          target_dir, 1.0, use_prev_state=use_prev_state)
        return guidance_loss(mdm, state, x0, hf_cur, target_xy, gp), x0

    def body(_, carry):
        hf_cur, mom, _ = carry
        (_, x0), g = jax.value_and_grad(obj, has_aux=True)(hf_cur)
        mom = gp.hf_momentum * mom + g * grad_mask
        hf_cur = jnp.clip(hf_cur - gp.guidance_str * mom,
                          -scfg.max_h, scfg.max_h)
        return hf_cur, mom, x0

    x0_init = mdm._denoise(params, state, x_t, t_batch, prev_std, hf,
                           target_dir, 1.0, use_prev_state=use_prev_state)
    hf_out, _, x0 = jax.lax.fori_loop(
        0, gp.hf_iters, body, (hf, jnp.zeros_like(hf), x0_init))
    return x0, hf_out
