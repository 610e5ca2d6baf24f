"""Terrain-aware kinematic motion optimization.

Polishes MDM-generated motions against their terrain: Adam over the frame
variables (root pos, root rot exp-map, joint dofs) with losses for source
matching, smoothness, terrain penetration, tagged-contact distance, foot
sliding, and jerk — the whole optimization is one jitted ``lax.scan`` on
device instead of a host loop of 3000 optimizer steps.

Reference parity: tools/motion_opt/motion_optimization.py:17-501
(losses + Adam schedule; defaults from PARC/kin_gen_default.yaml opt:).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from parc_tpu.anim import char_model as cm
from parc_tpu.utils import rotation as rot
from parc_tpu.utils import terrain as terrain_lib


@dataclasses.dataclass(frozen=True)
class MotionOptConfig:
    iters: int = 3000
    lr: float = 1e-3
    fps: float = 30.0
    w_source_pos: float = 1.0
    w_source_rot: float = 0.5
    w_source_dof: float = 0.5
    w_smooth: float = 0.1
    w_penetration: float = 10.0
    w_contact: float = 5.0
    w_slide: float = 2.0
    w_jerk: float = 1e-6
    jerk_clamp: float = 11666.0
    contact_eps: float = 0.03


def _body_points(model: cm.CharModel, frames34: jax.Array):
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
    return pts, body_pos


def motion_opt_loss(model: cm.CharModel, cfg: MotionOptConfig,
                    terrain: terrain_lib.Terrain, frames34: jax.Array,
                    source34: jax.Array, contacts: jax.Array
                    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss for a (T, 34) motion on its terrain."""
    losses = {}
    losses["source_pos"] = cfg.w_source_pos * jnp.mean(
        (frames34[..., 0:3] - source34[..., 0:3])**2)
    losses["source_rot"] = cfg.w_source_rot * jnp.mean(
        (frames34[..., 3:6] - source34[..., 3:6])**2)
    losses["source_dof"] = cfg.w_source_dof * jnp.mean(
        (frames34[..., 6:] - source34[..., 6:])**2)

    acc = frames34[..., 2:, :] - 2 * frames34[..., 1:-1, :] \
        + frames34[..., :-2, :]
    losses["smooth"] = cfg.w_smooth * jnp.mean(acc**2)

    pts, body_pos = _body_points(model, frames34)
    ground = terrain_lib.get_hf_val_bilinear(terrain, pts[..., 0:2])
    h_above = pts[..., 2] - model.contact_point_radius - ground

    pen = jnp.maximum(-h_above, 0.0)
    losses["penetration"] = cfg.w_penetration * jnp.mean(pen**2)

    # tagged contacts: the body's lowest point should touch the surface
    onehot = jax.nn.one_hot(model.contact_point_body, model.num_bodies)
    per_body_min = jnp.min(
        jnp.where(onehot.T[None] > 0, h_above[..., None, :], jnp.inf),
        axis=-1)  # (T, J)
    tagged = contacts > 0.5
    cdist = jnp.where(tagged, jnp.maximum(per_body_min - cfg.contact_eps,
                                          0.0), 0.0)
    # pseudo-huber keeps gradients bounded
    losses["contact"] = cfg.w_contact * jnp.mean(
        jnp.sqrt(cdist**2 + 1e-4) - 1e-2)

    # sliding: contact-tagged body points should not move horizontally
    vel = (pts[1:] - pts[:-1]) * cfg.fps
    pt_tagged = (tagged[..., model.contact_point_body]
                 & (h_above < cfg.contact_eps))[:-1]
    slide = jnp.where(pt_tagged,
                      jnp.sum(vel[..., 0:2]**2, axis=-1), 0.0)
    losses["slide"] = cfg.w_slide * jnp.mean(
        jnp.sqrt(slide + 1e-6) - 1e-3)

    # jerk clamp on body positions.  NOT jnp.linalg.norm: its gradient at
    # exactly zero is NaN, and a perfectly static motion has zero jerk —
    # max(|j|-clamp, 0)^2 then back-propagates 0 * NaN = NaN into every
    # frame variable on the first optimizer step.
    jerk = (body_pos[3:] - 3 * body_pos[2:-1] + 3 * body_pos[1:-2]
            - body_pos[:-3]) * cfg.fps**3
    jerk_mag = jnp.sqrt(jnp.sum(jerk**2, axis=-1) + 1e-12)
    losses["jerk"] = cfg.w_jerk * jnp.mean(
        jnp.maximum(jerk_mag - cfg.jerk_clamp, 0.0)**2)

    total = sum(losses.values())
    return total, losses


def motion_contact_optimization(model: cm.CharModel,
                                terrain: terrain_lib.Terrain,
                                frames34: jax.Array, contacts: jax.Array,
                                cfg: MotionOptConfig = MotionOptConfig()):
    """Optimize a (T, 34) motion; returns (optimized frames, final losses).

    The full Adam loop runs inside one jit (``lax.scan`` over iterations).
    """
    source = frames34
    tx = optax.adam(cfg.lr)

    def loss_fn(x):
        return motion_opt_loss(model, cfg, terrain, x, source, contacts)

    @jax.jit
    def run(x0):
        opt_state = tx.init(x0)

        def step(carry, _):
            x, opt = carry
            (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(x)
            updates, opt = tx.update(grads, opt, x)
            x = optax.apply_updates(x, updates)
            return (x, opt), total

        (x, _), totals = jax.lax.scan(step, (x0, opt_state), None,
                                      length=cfg.iters)
        return x, totals

    x, totals = run(frames34)
    _, final_losses = jax.jit(loss_fn)(x)
    return x, {k: float(v) for k, v in final_losses.items()}
