"""Fused Pallas substep kernel: PD torque + ABA + integrate + FK.

Why: one 120 Hz substep of the SoA physics lowers to dozens of small XLA
fusion kernels over (N,)-vectors — at 4096 envs each touches only ~16 KB,
so the substep is kernel-launch/HBM-latency bound, not compute bound
(measured ~0.44 ms/substep in-context).  This kernel runs the entire
generalized-coordinate update as ONE Pallas program per env block: the
state is read once from HBM in component-major (SoA) layout, the whole
Featherstone/integration/FK chain happens in VMEM registers via the same
column-level cores the XLA path uses (aba_soa.aba_soa_cols /
fk_vel_cols — numerics shared by construction), and the new state is
written once.

Heightfield contact stays OUTSIDE the kernel: its per-env table lookups
are already MXU one-hot contractions (utils/gather.py) and feed in as
``f_ext``.

Replaces: the XLA lowering of engine.sim_step's non-contact work
(reference native equivalent: Isaac Gym's PhysX articulation step,
envs/ig_env.py:827-848).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parc_tpu.anim import char_model as cm
from parc_tpu.physics import aba_soa
from parc_tpu.physics.aba_soa import (_add, _cross3, _exp_map_to_quat_cols,
                                      _quat_mul_cols, _quat_normalize_cols)

# env block per program: (8, 128) f32 tile = 1024 envs
_BLOCK = 8 * 128


# ---------------------------------------------------------------------------
# column-level pieces not already in aba_soa
# ---------------------------------------------------------------------------


def _quat_conj_cols(q):
    return [-q[0], -q[1], -q[2], q[3]]


def _atan2_nonneg(y, x):
    """atan2 for y >= 0, x >= 0 (Mosaic has no atan2 primitive).

    Octant reduction + the Cephes atanf minimax polynomial — f32-accurate
    (~1 ulp) on the unit-quaternion inputs this kernel feeds it."""
    swap = y > x
    num = jnp.minimum(y, x)
    den = jnp.maximum(y, x)
    t = num / jnp.maximum(den, 1e-30)
    red = t > 0.41421356237309503  # tan(pi/8)
    z = jnp.where(red, (t - 1.0) / (t + 1.0), t)
    zz = z * z
    p = ((8.05374449538e-2 * zz - 1.38776856032e-1) * zz
         + 1.99777106478e-1) * zz - 3.33329491539e-1
    r = p * zz * z + z
    r = jnp.where(red, r + 0.7853981633974483, r)
    return jnp.where(swap, 1.5707963267948966 - r, r)


def _quat_to_exp_map_cols(q, eps: float = 1e-5):
    """Column port of rot.quat_to_exp_map (axis*angle, w>=0 branch)."""
    neg = q[3] < 0
    x = jnp.where(neg, -q[0], q[0])
    y = jnp.where(neg, -q[1], q[1])
    z = jnp.where(neg, -q[2], q[2])
    w = jnp.where(neg, -q[3], q[3])
    length = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-18))
    angle = 2.0 * _atan2_nonneg(length, w)
    scale = jnp.where(length > eps, angle / length, 0.0)
    return [x * scale, y * scale, z * scale]


def _joint_exp_maps_cols(model: cm.CharModel, dv):
    """dof columns -> per-joint exp-map columns via the static dof_map."""
    dof_map = np.asarray(model.dof_map)  # (J-1, 3, D)
    out = []
    for j in range(model.num_bodies - 1):
        w = []
        for k in range(3):
            acc = None
            for d in range(model.dof_size):
                c = float(dof_map[j, k, d])
                if c == 0.0:
                    continue
                term = dv[d] * c if c != 1.0 else dv[d]
                acc = term if acc is None else acc + term
            w.append(0.0 if acc is None else acc)
        out.append(w)
    return out


def _project_to_dof_cols(model: cm.CharModel, per_joint):
    """per-joint 3-vector columns -> dof columns (static dof_map^T)."""
    dof_map = np.asarray(model.dof_map)
    out = []
    for d in range(model.dof_size):
        acc = None
        for j in range(model.num_bodies - 1):
            for k in range(3):
                c = float(dof_map[j, k, d])
                if c == 0.0:
                    continue
                x = per_joint[j][k]
                if isinstance(x, float) and x == 0.0:
                    continue
                term = x * c if c != 1.0 else x
                acc = term if acc is None else acc + term
        out.append(0.0 if acc is None else acc)
    return out


def _torque_cols(model: cm.CharModel, params, joint_rot_c, dv, act, qtar_c,
                 h: float):
    """Column port of engine.compute_joint_torques (all control modes)."""
    kp = np.asarray(model.dof_stiffness, np.float64)
    kd = np.asarray(model.dof_damping, np.float64)
    effort = (np.asarray(model.dof_motor_effort, np.float64)
              * params.torque_limit_scale)

    def clip(t, d):
        return jnp.clip(t, -float(effort[d]), float(effort[d]))

    mode = params.control_mode
    if mode == "torque":
        tau = [clip(act[d] * float(effort[d]), d)
               for d in range(model.dof_size)]
        return tau, [0.0] * model.dof_size

    if mode == "vel":
        tau = [clip(float(kd[d]) * (act[d] - dv[d]), d)
               for d in range(model.dof_size)]
        return tau, [0.0] * model.dof_size

    # current dof positions (for pd_1d and the limit springs)
    jq_exp = [_quat_to_exp_map_cols(joint_rot_c[j])
              for j in range(model.num_bodies - 1)]
    dof_pos = _project_to_dof_cols(model, jq_exp)

    if mode == "pd_1d":
        tau = [float(kp[d]) * (act[d] - dof_pos[d]) - float(kd[d]) * dv[d]
               for d in range(model.dof_size)]
        d_extra = [0.0] * model.dof_size
    else:
        # exp-map orientation error to the target quat
        err_j = [_quat_to_exp_map_cols(
            _quat_mul_cols(_quat_conj_cols(joint_rot_c[j]), qtar_c[j]))
            for j in range(model.num_bodies - 1)]
        err = _project_to_dof_cols(model, err_j)
        if mode == "pd_exp":
            tau = [float(kp[d]) * err[d] - float(kd[d]) * dv[d]
                   for d in range(model.dof_size)]
            d_extra = [0.0] * model.dof_size
        else:  # pd_implicit (SPD)
            tau = []
            d_extra = []
            for d in range(model.dof_size):
                kd_eff = float(kd[d]) + h * float(kp[d])
                tau.append(float(kp[d]) * err[d] - kd_eff * dv[d])
                d_extra.append(h * kd_eff)
    tau = [clip(t, d) for d, t in enumerate(tau)]

    lo = np.asarray(model.dof_limits_lower, np.float64)
    hi = np.asarray(model.dof_limits_upper, np.float64)

    if params.hard_joint_limits:
        # hard mode: stiff SPD-implicit unilateral boundary spring
        # (engine.compute_joint_torques hard branch)
        d_eff = params.hard_limit_damping + h * params.hard_limit_stiffness
        out, dx = [], []
        for d in range(model.dof_size):
            over = jnp.maximum(dof_pos[d] - float(hi[d]), 0.0)
            under = jnp.maximum(float(lo[d]) - dof_pos[d], 0.0)
            viol = ((over > 0) | (under > 0)).astype(jnp.float32)
            t_lim = (-params.hard_limit_stiffness * (over - under)
                     - d_eff * viol * dv[d])
            out.append(tau[d] + t_lim)
            dx.append(d_extra[d] + h * d_eff * viol)
        return out, dx

    # joint-limit penalty springs
    out = []
    for d in range(model.dof_size):
        over = jnp.maximum(dof_pos[d] - float(hi[d]), 0.0)
        under = jnp.maximum(float(lo[d]) - dof_pos[d], 0.0)
        viol = (over > 0) | (under > 0)
        t_lim = (-params.limit_stiffness * (over - under)
                 - params.limit_damping * jnp.where(viol, dv[d], 0.0))
        out.append(tau[d] + t_lim)
    return out, d_extra


def _integrate_cols(model: cm.CharModel, root_pos, root_rot, root_vel,
                    root_ang_vel, joint_rot_c, dv, root_acc, qdd, dt: float):
    """Column port of engine.integrate (semi-implicit Euler)."""
    zero = root_pos[0] * 0.0

    def arr(c):
        return zero + c if isinstance(c, float) else c

    ang_new = [root_ang_vel[k] + dt * arr(root_acc[k]) for k in range(3)]
    lin_acc = _add([arr(root_acc[3 + k]) for k in range(3)],
                   _cross3(root_ang_vel, root_vel))
    vel_new = [root_vel[k] + dt * lin_acc[k] for k in range(3)]
    dv_new = [dv[d] + dt * arr(qdd[d]) for d in range(model.dof_size)]

    pos_new = [root_pos[k] + dt * vel_new[k] for k in range(3)]
    dq_root = _exp_map_to_quat_cols([a * dt for a in ang_new])
    rot_new = _quat_normalize_cols(_quat_mul_cols(dq_root, root_rot))

    w_locals = _joint_exp_maps_cols(model, dv_new)
    joint_new = []
    for j in range(model.num_bodies - 1):
        dq = _exp_map_to_quat_cols([arr(w) * dt for w in w_locals[j]])
        joint_new.append(
            _quat_normalize_cols(_quat_mul_cols(joint_rot_c[j], dq)))
    return pos_new, rot_new, vel_new, ang_new, joint_new, dv_new


# ---------------------------------------------------------------------------
# packing layout
# ---------------------------------------------------------------------------


class _Layout:
    """Static row layout of a packed (C, N) kernel array."""

    def __init__(self, fields):
        self.fields = list(fields)
        self.offsets = {}
        off = 0
        for name, n in self.fields:
            self.offsets[name] = (off, n)
            off += n
        self.total = off

    def rows(self, name):
        o, n = self.offsets[name]
        return range(o, o + n)


def _state_layout(model: cm.CharModel) -> _Layout:
    J, D = model.num_bodies, model.dof_size
    return _Layout([
        ("root_pos", 3), ("root_rot", 4), ("root_vel", 3),
        ("root_ang_vel", 3), ("joint_rot", 4 * (J - 1)),
        ("dof_vel", D), ("body_pos", 3 * J), ("body_rot", 4 * J),
        ("body_vel", 3 * J), ("body_ang_vel", 3 * J),
    ])


def _fext_layout(model: cm.CharModel) -> _Layout:
    return _Layout([("f_ext", 6 * model.num_bodies)])


def _const_layout(model: cm.CharModel) -> _Layout:
    J, D = model.num_bodies, model.dof_size
    return _Layout([("act", D), ("qtar", 4 * (J - 1))])


def _pack(layout: _Layout, arrays: dict, n: int) -> jax.Array:
    """dict of (..., k)/(..., J, k) batch-major arrays -> (C, n) f32."""
    parts = []
    for name, _ in layout.fields:
        a = arrays[name].astype(jnp.float32)
        a = a.reshape((n, -1))
        parts.append(a.T)
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _substep_kernel(model, params, h, lstate, lfext, lconst,
                    state_ref, fext_ref, const_ref, out_ref):
    J, D = model.num_bodies, model.dof_size

    def rd(ref, layout, name):
        o, n = layout.offsets[name]
        return [ref[o + i] for i in range(n)]

    root_pos = rd(state_ref, lstate, "root_pos")
    root_rot = rd(state_ref, lstate, "root_rot")
    root_vel = rd(state_ref, lstate, "root_vel")
    root_ang_vel = rd(state_ref, lstate, "root_ang_vel")
    jr_flat = rd(state_ref, lstate, "joint_rot")
    joint_rot_c = [jr_flat[4 * j:4 * j + 4] for j in range(J - 1)]
    dv = rd(state_ref, lstate, "dof_vel")
    bp_flat = rd(state_ref, lstate, "body_pos")
    br_flat = rd(state_ref, lstate, "body_rot")
    bv_flat = rd(state_ref, lstate, "body_vel")
    ba_flat = rd(state_ref, lstate, "body_ang_vel")
    body_pos_c = [bp_flat[3 * j:3 * j + 3] for j in range(J)]
    body_rot_c = [br_flat[4 * j:4 * j + 4] for j in range(J)]
    body_vel_c = [bv_flat[3 * j:3 * j + 3] for j in range(J)]
    body_ang_c = [ba_flat[3 * j:3 * j + 3] for j in range(J)]
    fe_flat = rd(fext_ref, lfext, "f_ext")
    f_ext_c = [fe_flat[6 * j:6 * j + 6] for j in range(J)]
    act = rd(const_ref, lconst, "act")
    qt_flat = rd(const_ref, lconst, "qtar")
    qtar_c = [qt_flat[4 * j:4 * j + 4] for j in range(J - 1)]

    tau, d_extra = _torque_cols(model, params, joint_rot_c, dv, act,
                                qtar_c, h)
    root_acc, qdd = aba_soa.aba_soa_cols(
        model, params, dv, body_pos_c, body_rot_c, body_vel_c, body_ang_c,
        tau, d_extra, f_ext_c)
    (pos_new, rot_new, vel_new, ang_new, joint_new,
     dv_new) = _integrate_cols(model, root_pos, root_rot, root_vel,
                               root_ang_vel, joint_rot_c, dv, root_acc,
                               qdd, h)
    fk_pos, fk_quat, fk_lin, fk_ang = aba_soa.fk_vel_cols(
        model, pos_new, rot_new,
        joint_new, vel_new, ang_new, dv_new)

    zero = root_pos[0] * 0.0

    def wr(name, cols):
        o, _ = lstate.offsets[name]
        for i, c in enumerate(cols):
            out_ref[o + i] = zero + c if isinstance(c, float) else c

    wr("root_pos", pos_new)
    wr("root_rot", rot_new)
    wr("root_vel", vel_new)
    wr("root_ang_vel", ang_new)
    wr("joint_rot", [c for q in joint_new for c in q])
    wr("dof_vel", dv_new)
    wr("body_pos", [c for p in fk_pos for c in p])
    wr("body_rot", [c for q in fk_quat for c in q])
    wr("body_vel", [c for v in fk_lin for c in v])
    wr("body_ang_vel", [c for w in fk_ang for c in w])


def control_step_pallas(model: cm.CharModel, params, terrain, state,
                        pd_target_dof: jax.Array, sim_steps: int = 2,
                        terrain_idx: Optional[jax.Array] = None,
                        interpret: bool = False):
    """Drop-in replacement for engine.control_step on TPU (contact in XLA,
    everything else fused in one Pallas kernel per substep).

    v2: the state stays component-major (packed (C, N)) ACROSS all
    ``sim_steps x substeps`` kernel calls — one pack before and one unpack
    after the whole control step.  Between substeps only the body arrays
    (13J rows) are transposed out for the XLA contact pass, and only
    f_ext (6J rows) is packed back in; the PD targets are packed once."""
    from parc_tpu.physics import engine

    n = state.root_pos.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    h = params.dt / params.substeps
    lstate = _state_layout(model)
    lfext = _fext_layout(model)
    lconst = _const_layout(model)
    J = model.num_bodies

    if params.control_mode in ("pd_implicit", "pd_exp"):
        qtar = cm.dof_to_rot(model, pd_target_dof)
    else:
        qtar = jnp.zeros(pd_target_dof.shape[:-1]
                         + (model.num_bodies - 1, 4))

    grid = n_pad // _BLOCK
    kernel = functools.partial(_substep_kernel, model, params, h,
                               lstate, lfext, lconst)

    def spec(layout):
        return pl.BlockSpec((layout.total, 1, 8, 128),
                            lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((lstate.total, grid, 8, 128),
                                       jnp.float32),
        in_specs=[spec(lstate), spec(lfext), spec(lconst)],
        out_specs=spec(lstate),
        grid=(grid,),
        interpret=interpret,
    )

    def pad(a):
        if n_pad == n:
            return a
        reps = jnp.broadcast_to(a[0:1], (n_pad - n,) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    def to_blocks(packed, layout):
        return packed.reshape(layout.total, grid, 8, 128)

    state_p = to_blocks(_pack(lstate, {
        "root_pos": pad(state.root_pos), "root_rot": pad(state.root_rot),
        "root_vel": pad(state.root_vel),
        "root_ang_vel": pad(state.root_ang_vel),
        "joint_rot": pad(state.joint_rot), "dof_vel": pad(state.dof_vel),
        "body_pos": pad(state.body_pos), "body_rot": pad(state.body_rot),
        "body_vel": pad(state.body_vel),
        "body_ang_vel": pad(state.body_ang_vel),
    }, n_pad), lstate)
    const_p = to_blocks(_pack(lconst, {
        "act": pad(pd_target_dof), "qtar": pad(qtar),
    }, n_pad), lconst)
    tidx_p = pad(terrain_idx) if terrain_idx is not None else None

    def un(flat2d, layout, name, count, shape):
        o, k = layout.offsets[name]
        return flat2d[o:o + k].T.reshape((count,) + shape)

    net_accum = jnp.zeros_like(state.contact_forces)
    for _ in range(sim_steps):
        step_net = jnp.zeros((n_pad, J, 3), state.contact_forces.dtype)
        for _ in range(params.substeps):
            flat = state_p.reshape(lstate.total, n_pad)
            # contact reads only the body arrays (engine
            # compute_contact_forces touches no other state field)
            contact_view = state.replace(
                body_pos=un(flat, lstate, "body_pos", n_pad, (J, 3)),
                body_rot=un(flat, lstate, "body_rot", n_pad, (J, 4)),
                body_vel=un(flat, lstate, "body_vel", n_pad, (J, 3)),
                body_ang_vel=un(flat, lstate, "body_ang_vel", n_pad,
                                (J, 3)))
            f_ext, net = engine.compute_contact_forces(
                model, params, terrain, contact_view, tidx_p)
            step_net = step_net + net
            fext_p = to_blocks(_pack(lfext, {"f_ext": f_ext}, n_pad), lfext)
            state_p = call(state_p, fext_p, const_p)
        net_accum = step_net[:n] / params.substeps

    flat = state_p.reshape(lstate.total, n_pad)[:, :n]
    return state.replace(
        root_pos=un(flat, lstate, "root_pos", n, (3,)),
        root_rot=un(flat, lstate, "root_rot", n, (4,)),
        root_vel=un(flat, lstate, "root_vel", n, (3,)),
        root_ang_vel=un(flat, lstate, "root_ang_vel", n, (3,)),
        joint_rot=un(flat, lstate, "joint_rot", n, (J - 1, 4)),
        dof_vel=un(flat, lstate, "dof_vel", n, (model.dof_size,)),
        body_pos=un(flat, lstate, "body_pos", n, (J, 3)),
        body_rot=un(flat, lstate, "body_rot", n, (J, 4)),
        body_vel=un(flat, lstate, "body_vel", n, (J, 3)),
        body_ang_vel=un(flat, lstate, "body_ang_vel", n, (J, 3)),
        contact_forces=net_accum)
