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
from flax import struct

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
    # strong relative to the source losses, like the reference's 1000:1
    # w_body_constraints:w_root_pos ratio (kin_gen_default.yaml opt:)
    w_body_constraint: float = 20.0
    w_jerk: float = 1e-6
    jerk_clamp: float = 11666.0
    contact_eps: float = 0.03
    # auto-estimated contact-run constraints (reference:
    # motion_optimization.py:34-181, kin_gen_default.yaml
    # auto_compute_body_constraints)
    auto_body_constraints: bool = True
    max_constraints: int = 32


@struct.dataclass
class BodyConstraints:
    """Fixed-shape per-contact-run constraints: during frames
    [start, end], body ``body_id`` is pinned near ``point`` (a terrain-
    surface-projected average contact location).  Padded to a static K
    with ``valid`` flags so the pytree is jittable.

    Reference parity: tools/motion_opt/motion_optimization.py:34-181
    (BodyConstraint list per body) + the BODY_CONSTRAINT_LOSS application
    (:286-330, sphere |sd| pin / box clamp(sd, min=0)).
    """

    body_ids: jnp.ndarray   # (K,) int32
    starts: jnp.ndarray     # (K,) int32
    ends: jnp.ndarray       # (K,) int32
    points: jnp.ndarray     # (K, 3)
    offsets: jnp.ndarray    # (K, 3) body-frame geom-center offset
    radius: jnp.ndarray     # (K,)
    pin: jnp.ndarray        # (K,) 1.0 = |sd| pin (sphere), 0.0 = clamp-only
    valid: jnp.ndarray      # (K,) bool

    @property
    def num_valid(self) -> int:
        import numpy as _np
        return int(_np.asarray(self.valid).sum())


def _consecutive_runs(mask) -> list:
    """[(start, end)] inclusive index ranges of consecutive True runs."""
    import numpy as np
    idx = np.nonzero(np.asarray(mask))[0]
    if len(idx) == 0:
        return []
    breaks = np.nonzero(np.diff(idx) > 1)[0]
    starts = np.concatenate([[idx[0]], idx[breaks + 1]])
    ends = np.concatenate([idx[breaks], [idx[-1]]])
    return list(zip(starts.tolist(), ends.tolist()))


def compute_approx_body_constraints(model: cm.CharModel,
                                    terrain: terrain_lib.Terrain,
                                    frames34: jax.Array,
                                    contacts: jax.Array,
                                    cfg: MotionOptConfig = MotionOptConfig(),
                                    contact_threshold: float = 0.9,
                                    project_iters: int = 300,
                                    project_lr: float = 0.01
                                    ) -> BodyConstraints:
    """Estimate contact-run constraints from tagged contacts.

    Per end-effector body (feet/hands): consecutive contact runs become one
    constraint each, anchored at the run-average body-center position and
    projected onto the terrain surface by minimizing sdf^2 (batched jitted
    SGD — the reference runs 1000 host SGD steps per point,
    motion_optimization.py:93-116).
    """
    import numpy as np
    frames34 = jnp.asarray(frames34)
    root_rot = rot.exp_map_to_quat(frames34[..., 3:6])
    joint_rot = cm.dof_to_rot(model, frames34[..., 6:])
    body_pos, body_rot = cm.forward_kinematics(
        model, frames34[..., 0:3], root_rot, joint_rot)

    # per-body effective contact radius + mean contact-point offset from
    # the body's contact-point cloud
    nb = model.num_bodies
    cpb = np.asarray(model.contact_point_body)
    cpo = np.asarray(model.contact_point_offset)
    cpr = np.asarray(model.contact_point_radius)
    eff_radius = np.zeros(nb, np.float32)
    mean_off = np.zeros((nb, 3), np.float32)
    n_pts = np.zeros(nb, np.int64)
    for b in range(nb):
        sel = cpb == b
        if sel.any():
            eff_radius[b] = float(
                (np.linalg.norm(cpo[sel], axis=-1) + cpr[sel]).max())
            mean_off[b] = cpo[sel].mean(0)
            n_pts[b] = int(sel.sum())

    targets = [i for i, n in enumerate(model.body_names)
               if ("foot" in n or "hand" in n) and n_pts[i] > 0]
    centers = np.asarray(
        body_pos + rot.quat_rotate(body_rot,
                                   jnp.broadcast_to(jnp.asarray(mean_off),
                                                    body_pos.shape)))
    contacts_np = np.asarray(contacts)

    rows = []
    for b in targets:
        for s, e in _consecutive_runs(contacts_np[:, b] > contact_threshold):
            rows.append((b, s, e, centers[s:e + 1, b].mean(0),
                         eff_radius[b], 1.0 if n_pts[b] == 1 else 0.0))
    k = cfg.max_constraints
    rows = rows[:k]
    body_ids = np.zeros(k, np.int32)
    starts = np.zeros(k, np.int32)
    ends = np.full(k, -1, np.int32)
    points = np.zeros((k, 3), np.float32)
    offsets = np.zeros((k, 3), np.float32)
    radius = np.ones(k, np.float32)
    pin = np.zeros(k, np.float32)
    valid = np.zeros(k, bool)
    for i, (b, s, e, p, r, pin_i) in enumerate(rows):
        body_ids[i] = b
        starts[i] = s
        ends[i] = e
        points[i] = p
        offsets[i] = mean_off[b]
        radius[i] = r
        pin[i] = pin_i
        valid[i] = True

    # project all constraint points onto the terrain surface at once;
    # terrain enters as a jit ARGUMENT (CLAUDE.md rule 1: closed-over
    # device arrays are fetched back through the remote-TPU tunnel during
    # lowering)
    if rows:
        @jax.jit
        def project(terrain, points):
            def step(pts, _):
                g = jax.grad(lambda p: jnp.sum(
                    terrain_lib.terrain_sdf(terrain, p, inverted=False)**2)
                )(pts)
                return pts - project_lr * g, None
            pts, _ = jax.lax.scan(step, points, None, length=project_iters)
            return pts
        points = np.asarray(project(terrain, jnp.asarray(points)))

    return BodyConstraints(
        body_ids=jnp.asarray(body_ids), starts=jnp.asarray(starts),
        ends=jnp.asarray(ends), points=jnp.asarray(points),
        offsets=jnp.asarray(offsets), radius=jnp.asarray(radius),
        pin=jnp.asarray(pin), valid=jnp.asarray(valid))


def body_constraint_loss(cfg: MotionOptConfig, bc: BodyConstraints,
                         body_pos: jax.Array,
                         body_rot: jax.Array) -> jax.Array:
    """Mean constraint violation; body_pos/rot (T, J, 3)/(T, J, 4)."""
    t_len = body_pos.shape[0]
    t_idx = jnp.arange(t_len)[:, None]                       # (T, 1)
    active = ((t_idx >= bc.starts[None]) & (t_idx <= bc.ends[None])
              & bc.valid[None])                              # (T, K)
    pos = (body_pos[:, bc.body_ids]
           + rot.quat_rotate(body_rot[:, bc.body_ids],
                             jnp.broadcast_to(bc.offsets[None],
                                              body_pos[:, bc.body_ids].shape))
           )                                                  # (T, K, 3)
    diff = pos - bc.points[None]
    # sqrt(sum^2 + eps): gradient finite at zero distance
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)
    sd = dist - bc.radius
    per = jnp.where(bc.pin[None] > 0.5, jnp.abs(sd), jnp.maximum(sd, 0.0))
    return jnp.sum(jnp.where(active, per, 0.0)) / t_len


def constraint_slide_mask(bc: BodyConstraints, t_len: int,
                          num_bodies: int) -> jax.Array:
    """(T, J) True where a body constraint overrides the sliding loss
    (reference: motion_optimization.py:330 nulls sliding during
    constrained frames — the constraint pins the body instead)."""
    t_idx = jnp.arange(t_len)[:, None]
    active = ((t_idx >= bc.starts[None]) & (t_idx <= bc.ends[None])
              & bc.valid[None])                              # (T, K)
    onehot = jax.nn.one_hot(bc.body_ids, num_bodies)         # (K, J)
    return jnp.einsum("tk,kj->tj", active.astype(jnp.float32), onehot) > 0


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
    return pts, body_pos, body_rot


def motion_opt_loss(model: cm.CharModel, cfg: MotionOptConfig,
                    terrain: terrain_lib.Terrain, frames34: jax.Array,
                    source34: jax.Array, contacts: jax.Array,
                    constraints: "BodyConstraints" = None
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

    pts, body_pos, body_rot = _body_points(model, frames34)
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
    if constraints is not None:
        # a body constraint pins the body at a fixed point — it overrides
        # (nulls) the competing sliding loss during constrained frames
        # (reference: motion_optimization.py:330)
        cmask = constraint_slide_mask(constraints, frames34.shape[0],
                                      model.num_bodies)
        pt_tagged = pt_tagged & ~cmask[:-1, model.contact_point_body]
    slide = jnp.where(pt_tagged,
                      jnp.sum(vel[..., 0:2]**2, axis=-1), 0.0)
    losses["slide"] = cfg.w_slide * jnp.mean(
        jnp.sqrt(slide + 1e-6) - 1e-3)

    if constraints is not None:
        losses["body_constraint"] = cfg.w_body_constraint * \
            body_constraint_loss(cfg, constraints, body_pos, body_rot)

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
                                cfg: MotionOptConfig = MotionOptConfig(),
                                constraints: "BodyConstraints" = None):
    """Optimize a (T, 34) motion; returns (optimized frames, final losses).

    The full Adam loop runs inside one jit (``lax.scan`` over iterations).
    With ``cfg.auto_body_constraints`` (default, reference
    kin_gen_default.yaml auto_compute_body_constraints) contact-run
    constraints are estimated from the tagged contacts first.
    """
    source = frames34
    tx = optax.adam(cfg.lr)
    if constraints is None and cfg.auto_body_constraints \
            and cfg.w_body_constraint > 0:
        constraints = compute_approx_body_constraints(
            model, terrain, frames34, contacts, cfg)

    def loss_fn(x, bc):
        return motion_opt_loss(model, cfg, terrain, x, source, contacts,
                               constraints=bc)

    @jax.jit
    def run(x0, bc):
        opt_state = tx.init(x0)

        def step(carry, _):
            x, opt = carry
            (total, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(x, bc)
            updates, opt = tx.update(grads, opt, x)
            x = optax.apply_updates(x, updates)
            return (x, opt), total

        (x, _), totals = jax.lax.scan(step, (x0, opt_state), None,
                                      length=cfg.iters)
        return x, totals

    x, totals = run(frames34, constraints)
    _, final_losses = jax.jit(loss_fn)(x, constraints)
    return x, {k: float(v) for k, v in final_losses.items()}


def _mmean(x: jax.Array, w: jax.Array) -> jax.Array:
    """Per-clip masked mean: x (K, T, ...) weighted by w (K, T) -> (K,).

    Averages over every non-K axis with w broadcast across the trailing
    dims — for a full mask this equals jnp.mean over the clip, so each
    clip's term matches the single-clip loss exactly."""
    trailing = 1.0
    for d in x.shape[2:]:
        trailing *= d
    wb = w.reshape(w.shape + (1,) * (x.ndim - w.ndim))
    num = jnp.sum(x * wb, axis=tuple(range(1, x.ndim)))
    den = jnp.sum(w, axis=1) * trailing
    return num / jnp.maximum(den, 1e-9)


def motion_opt_loss_batched(model: cm.CharModel, cfg: MotionOptConfig,
                            stacked: terrain_lib.Terrain,
                            terrain_idx: jax.Array,
                            frames34: jax.Array, source34: jax.Array,
                            contacts: jax.Array, valid: jax.Array,
                            constraints: "BodyConstraints" = None
                            ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Per-clip totals for K length-padded motions in one program.

    frames34/source34 (K, T, 34); contacts (K, T, J); valid (K, T) —
    padded frames (valid 0) contribute nothing to any term, so each
    clip's loss equals its single-clip :func:`motion_opt_loss` on the
    unpadded motion.  Each row reads ITS terrain through the stacked
    one-hot lookups (utils/terrain.get_hf_val_bilinear_stacked).
    constraints, if given, is a K-leading stacked BodyConstraints.
    Returns ((K,) totals, dict of (K,) per-clip losses)."""
    v = valid.astype(frames34.dtype)
    losses = {}
    losses["source_pos"] = cfg.w_source_pos * _mmean(
        (frames34[..., 0:3] - source34[..., 0:3])**2, v)
    losses["source_rot"] = cfg.w_source_rot * _mmean(
        (frames34[..., 3:6] - source34[..., 3:6])**2, v)
    losses["source_dof"] = cfg.w_source_dof * _mmean(
        (frames34[..., 6:] - source34[..., 6:])**2, v)

    v3 = v[:, 2:] * v[:, 1:-1] * v[:, :-2]
    acc = frames34[:, 2:] - 2 * frames34[:, 1:-1] + frames34[:, :-2]
    losses["smooth"] = cfg.w_smooth * _mmean(acc**2, v3)

    pts, body_pos, body_rot = _body_points(model, frames34)
    ground = terrain_lib.get_hf_val_bilinear_stacked(
        stacked, terrain_idx, pts[..., 0:2])
    h_above = pts[..., 2] - model.contact_point_radius - ground

    pen = jnp.maximum(-h_above, 0.0)
    losses["penetration"] = cfg.w_penetration * _mmean(pen**2, v)

    onehot = jax.nn.one_hot(model.contact_point_body, model.num_bodies)
    per_body_min = jnp.min(
        jnp.where(onehot.T[None, None] > 0, h_above[..., None, :], jnp.inf),
        axis=-1)                                           # (K, T, J)
    tagged = contacts > 0.5
    cdist = jnp.where(tagged, jnp.maximum(per_body_min - cfg.contact_eps,
                                          0.0), 0.0)
    losses["contact"] = cfg.w_contact * _mmean(
        jnp.sqrt(cdist**2 + 1e-4) - 1e-2, v)

    vel = (pts[:, 1:] - pts[:, :-1]) * cfg.fps
    pt_tagged = (tagged[..., model.contact_point_body]
                 & (h_above < cfg.contact_eps))[:, :-1]
    if constraints is not None:
        cmask = jax.vmap(constraint_slide_mask,
                         in_axes=(0, None, None))(
            constraints, frames34.shape[1], model.num_bodies)
        pt_tagged = pt_tagged & ~cmask[:, :-1, model.contact_point_body]
    slide = jnp.where(pt_tagged,
                      jnp.sum(vel[..., 0:2]**2, axis=-1), 0.0)
    v2 = v[:, 1:] * v[:, :-1]
    losses["slide"] = cfg.w_slide * _mmean(
        jnp.sqrt(slide + 1e-6) - 1e-3, v2)

    if constraints is not None:
        # single-clip loss divides its sum by T: reproduce per clip with
        # the true (unpadded) length
        bc_sums = jax.vmap(
            lambda bc, bp, br: body_constraint_loss(cfg, bc, bp, br)
        )(constraints, body_pos, body_rot) * frames34.shape[1]
        lengths = jnp.maximum(jnp.sum(v, axis=1), 1.0)
        losses["body_constraint"] = (cfg.w_body_constraint
                                     * bc_sums / lengths)

    jerk = (body_pos[:, 3:] - 3 * body_pos[:, 2:-1] + 3 * body_pos[:, 1:-2]
            - body_pos[:, :-3]) * cfg.fps**3
    jerk_mag = jnp.sqrt(jnp.sum(jerk**2, axis=-1) + 1e-12)
    v4 = v[:, 3:] * v[:, 2:-1] * v[:, 1:-2] * v[:, :-3]
    losses["jerk"] = cfg.w_jerk * _mmean(
        jnp.maximum(jerk_mag - cfg.jerk_clamp, 0.0)**2, v4)

    totals = sum(losses.values())
    return totals, losses


def motion_contact_optimization_batched(
        model: cm.CharModel, terrains, clips_frames34, clips_contacts,
        cfg: MotionOptConfig = MotionOptConfig(), pad_to: int = None):
    """Optimize K variable-length motions (each on ITS OWN terrain) in
    ONE jitted Adam scan.

    The single-clip path re-traces and re-compiles per clip because every
    motion has a different length T; at reference scale (3000 Adam iters
    x top-2 clips x 2000 motions/iteration, PARC/kin_gen_default.yaml)
    those compiles dominate kin-gen wall-clock on a remote TPU.  Here
    clips are padded to one static T (repeat-last-frame; padded frames
    are masked out of every loss term and receive zero gradient), the K
    per-clip totals are summed (clips are independent, so the joint Adam
    step equals K independent steps), and the whole thing is one device
    program with per-row stacked-terrain lookups.

    Args:
      terrains: list of K Terrain (one per clip).
      clips_frames34 / clips_contacts: lists of (T_i, 34) / (T_i, J).
      pad_to: static padded length (>= max T_i); defaults to max T_i.

    Returns list of K (frames (T_i, 34), final-loss dict) pairs.
    """
    import numpy as np
    k = len(terrains)
    assert k == len(clips_frames34) == len(clips_contacts) and k > 0
    lengths = [int(f.shape[0]) for f in clips_frames34]
    t_pad = int(pad_to or max(lengths))
    assert t_pad >= max(lengths)
    nb = model.num_bodies

    def pad(x, t):
        x = np.asarray(x, np.float32)
        return np.concatenate(
            [x, np.repeat(x[-1:], t - x.shape[0], axis=0)]) \
            if x.shape[0] < t else x

    frames = jnp.asarray(np.stack([pad(f, t_pad) for f in clips_frames34]))
    contacts_p = np.stack([pad(c, t_pad) for c in clips_contacts])
    # padded frames carry no contact tags (no spurious contact loss)
    for i, li in enumerate(lengths):
        contacts_p[i, li:] = 0.0
    contacts_j = jnp.asarray(contacts_p)
    valid = jnp.asarray(
        np.arange(t_pad)[None] < np.asarray(lengths)[:, None],
        jnp.float32)

    stacked = terrain_lib.stack_terrains(terrains)
    terrain_idx = jnp.arange(k)

    constraints = None
    if cfg.auto_body_constraints and cfg.w_body_constraint > 0:
        # per-clip estimation on the clip's own terrain (host-side,
        # fixed (max_constraints,) shapes), then stacked K-leading
        per_clip = [
            compute_approx_body_constraints(
                model, terrains[i], jnp.asarray(clips_frames34[i]),
                jnp.asarray(clips_contacts[i]), cfg)
            for i in range(k)]
        constraints = jax.tree.map(lambda *xs: jnp.stack(xs), *per_clip)
        # run starts/ends index into the padded timeline unchanged (the
        # valid region is a prefix), so no re-indexing is needed

    tx = optax.adam(cfg.lr)

    def loss_fn(x, bc):
        totals, per = motion_opt_loss_batched(
            model, cfg, stacked, terrain_idx, x, frames, contacts_j,
            valid, constraints=bc)
        return jnp.sum(totals), per

    @jax.jit
    def run(x0, bc):
        opt_state = tx.init(x0)

        def step(carry, _):
            x, opt = carry
            (total, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(x, bc)
            updates, opt = tx.update(grads, opt, x)
            x = optax.apply_updates(x, updates)
            return (x, opt), total

        (x, _), totals = jax.lax.scan(step, (x0, opt_state), None,
                                      length=cfg.iters)
        return x, totals

    x, _ = run(frames, constraints)
    _, final_losses = jax.jit(loss_fn)(x, constraints)
    x_np = np.asarray(x)
    out = []
    for i, li in enumerate(lengths):
        out.append((jnp.asarray(x_np[i, :li]),
                    {kk: float(vv[i]) for kk, vv in final_losses.items()}))
    return out
