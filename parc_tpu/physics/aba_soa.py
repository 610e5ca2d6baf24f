"""Structure-of-arrays Featherstone ABA (the production TPU formulation).

Why this exists: the natural (N, 6, 6) batched-matrix layout wastes the
TPU's (8, 128) register tiles — a 6x6 matrix occupies one full tile at
~3.5% utilization, so every XLA op on it moves ~30x more physical memory
than payload. Here every scalar component of every spatial quantity is its
own (N,) vector (N = envs, lane-packed at 100% utilization) and all the
tiny matrix algebra is unrolled into scalar expressions over those vectors,
which XLA fuses into a handful of large elementwise kernels.

Semantics are identical to engine.aba_reference (per-joint Featherstone,
world-axis body-origin frames); a parity test pins them together.

Reference chain being replaced: Isaac Gym's native PhysX articulation solve
(envs/ig_env.py:827-848 `gym.simulate`).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm

# Vectors/matrices are python lists of (N,) jax arrays (or python floats
# for static zeros), row-major for matrices.


def _mat(rows: int, cols: int, val=0.0) -> list:
    return [val] * (rows * cols)


def _matmul(a, b, n, k, m) -> list:
    """(n x k) @ (k x m), lists row-major."""
    out = []
    for i in range(n):
        for j in range(m):
            acc = None
            for l in range(k):
                x, y = a[i * k + l], b[l * m + j]
                if _is_zero(x) or _is_zero(y):
                    continue
                term = x * y
                acc = term if acc is None else acc + term
            out.append(0.0 if acc is None else acc)
    return out


def _matvec(a, v, n, k) -> list:
    return _matmul(a, v, n, k, 1)


def _mat_t(a, n, m) -> list:
    return [a[j * m + i] for i in range(m) for j in range(n)]


def _add(a, b) -> list:
    return [_addx(x, y) for x, y in zip(a, b)]


def _sub(a, b) -> list:
    return [_addx(x, -y if not _is_zero(y) else 0.0) for x, y in zip(a, b)]


def _scale(a, s) -> list:
    return [0.0 if _is_zero(x) else x * s for x in a]


def _is_zero(x) -> bool:
    return isinstance(x, (int, float)) and x == 0.0


def _addx(x, y):
    if _is_zero(x):
        return y
    if _is_zero(y):
        return x
    return x + y


def _cross3(a, b) -> list:
    return [
        _addx(a[1] * b[2] if not (_is_zero(a[1]) or _is_zero(b[2])) else 0.0,
              -(a[2] * b[1]) if not (_is_zero(a[2]) or _is_zero(b[1])) else 0.0),
        _addx(a[2] * b[0] if not (_is_zero(a[2]) or _is_zero(b[0])) else 0.0,
              -(a[0] * b[2]) if not (_is_zero(a[0]) or _is_zero(b[2])) else 0.0),
        _addx(a[0] * b[1] if not (_is_zero(a[0]) or _is_zero(b[1])) else 0.0,
              -(a[1] * b[0]) if not (_is_zero(a[1]) or _is_zero(b[0])) else 0.0),
    ]


def _skew(v) -> list:
    return [0.0, -v[2], v[1],
            v[2], 0.0, -v[0],
            -v[1], v[0], 0.0]


def _quat_to_m33(q) -> list:
    """q = [x, y, z, w] columns -> rotation matrix (row-major list of 9)."""
    x, y, z, w = q
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    return [1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy)]


def _inv3_cols(m) -> Tuple[list, object]:
    a, b, c, d, e, f, g, h, i = m
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv = 1.0 / det
    adj = [co_a, c * h - b * i, b * f - c * e,
           co_b, a * i - c * g, c * d - a * f,
           co_c, b * g - a * h, a * e - b * d]
    return [x * inv for x in adj], det


def _cross_motion(v, m) -> list:
    """v x_m m for 6-vectors (ang; lin)."""
    w, u = v[0:3], v[3:6]
    mw, mu = m[0:3], m[3:6]
    top = _cross3(w, mw)
    bot = _add(_cross3(w, mu), _cross3(u, mw))
    return top + bot


def _cross_force(v, f) -> list:
    w, u = v[0:3], v[3:6]
    n, fo = f[0:3], f[3:6]
    top = _add(_cross3(w, n), _cross3(u, fo))
    bot = _cross3(w, fo)
    return top + bot


def _shift_motion(m, r) -> list:
    w, u = m[0:3], m[3:6]
    return list(w) + _add(u, _cross3(w, r))


def _shift_force(f, r) -> list:
    n, fo = f[0:3], f[3:6]
    return _add(n, _cross3(r, fo)) + list(fo)


def _shift_inertia(ia, r) -> list:
    """xf @ ia @ xm with xf = [[1, rx], [0, 1]], xm = [[1, 0], [-rx, 1]]."""
    rx = _skew(r)
    # xf @ ia: rows 0:3 += rx @ ia[3:6, :]
    top = []
    for i in range(3):
        for j in range(6):
            acc = ia[i * 6 + j]
            for l in range(3):
                x = rx[i * 3 + l]
                if _is_zero(x):
                    continue
                acc = _addx(acc, x * ia[(3 + l) * 6 + j])
            top.append(acc)
    out = top + ia[18:36]
    # @ xm: cols 0:3 -= (@ rx) of cols 3:6
    res = list(out)
    for i in range(6):
        for j in range(3):
            acc = out[i * 6 + j]
            for l in range(3):
                x = rx[l * 3 + j]
                if _is_zero(x):
                    continue
                acc = _addx(acc, -(out[i * 6 + 3 + l] * x))
            res[i * 6 + j] = acc
    return res


def _solve6_sym(m, r) -> list:
    """Symmetric 6x6 solve via 3x3 block Schur complement."""
    a = [m[i * 6 + j] for i in range(3) for j in range(3)]
    b = [m[i * 6 + j + 3] for i in range(3) for j in range(3)]
    d = [m[(i + 3) * 6 + j + 3] for i in range(3) for j in range(3)]
    r1, r2 = r[0:3], r[3:6]
    a_inv, _ = _inv3_cols(a)
    bt_ainv = _matmul(_mat_t(b, 3, 3), a_inv, 3, 3, 3)
    schur = _sub(d, _matmul(bt_ainv, b, 3, 3, 3))
    schur_inv, _ = _inv3_cols(schur)
    x2 = _matvec(schur_inv, _sub(r2, _matvec(bt_ainv, r1, 3, 3)), 3, 3)
    x1 = _matvec(a_inv, _sub(r1, _matvec(b, x2, 3, 3)), 3, 3)
    return x1 + x2


def _cols(x: jax.Array, n: int) -> list:
    """(..., n) -> list of n (...) arrays."""
    return [x[..., i] for i in range(n)]


def aba_soa(model: cm.CharModel, params, state, tau: jax.Array,
            d_extra: jax.Array, f_ext: jax.Array, dt: float):
    """Drop-in replacement for engine.aba_reference (same contract)."""
    dtype = state.root_pos.dtype
    tau_c = _cols(tau, model.dof_size)
    dex_c = _cols(d_extra, model.dof_size)
    dv_c = _cols(state.dof_vel, model.dof_size)
    body_rot_c = [_cols(state.body_rot[..., j, :], 4)
                  for j in range(model.num_bodies)]
    body_pos_c = [_cols(state.body_pos[..., j, :], 3)
                  for j in range(model.num_bodies)]
    body_vel_c = [_cols(state.body_vel[..., j, :], 3)
                  for j in range(model.num_bodies)]
    body_ang_c = [_cols(state.body_ang_vel[..., j, :], 3)
                  for j in range(model.num_bodies)]
    f_ext_c = [_cols(f_ext[..., j, :], 6) for j in range(model.num_bodies)]

    root_acc, qdd_c = aba_soa_cols(
        model, params, dv_c, body_pos_c, body_rot_c, body_vel_c, body_ang_c,
        tau_c, dex_c, f_ext_c)

    batch = state.root_pos.shape[:-1]

    def as_arr(col):
        if isinstance(col, (int, float)):
            return jnp.full(batch, col, dtype)
        return col
    root_acc_arr = jnp.stack([as_arr(c) for c in root_acc], axis=-1)
    qdd_arr = jnp.stack([as_arr(c) for c in qdd_c], axis=-1)
    return root_acc_arr, qdd_arr


def aba_soa_cols(model: cm.CharModel, params, dv_c, body_pos_c, body_rot_c,
                 body_vel_c, body_ang_c, tau_c, dex_c, f_ext_c):
    """Column-level ABA core: inputs/outputs are python lists of same-shaped
    arrays (any shape — (N,) under jit, VMEM blocks inside a Pallas
    kernel).  Returns (root_acc list[6], qdd list[dof_size], entries may be
    scalar 0.0)."""
    nb = model.num_bodies

    body_r = []          # 3x3 rotation per body
    v = []               # spatial velocity per body
    pos = body_pos_c     # body origin positions
    for j in range(nb):
        body_r.append(_quat_to_m33(body_rot_c[j]))
        v.append(list(body_ang_c[j]) + list(body_vel_c[j]))

    # --- joint subspaces, joint velocities, bias ------------------------
    s_mats: List = [None] * nb   # 6x3 (list of 18) padded subspaces
    c_bias: List = [None] * nb
    dof_sel = []                 # per joint: (offset, d)
    for j in range(1, nb):
        jt = model.joint_types[j]
        o = model.dof_offsets[j]
        r9 = body_r[j]
        if jt == cm.SPHERICAL:
            s_ang = r9
            qd3 = [dv_c[o], dv_c[o + 1], dv_c[o + 2]]
            d = 3
        elif jt == cm.HINGE:
            ax = np.asarray(model.joint_axes[j], np.float64)
            axl = [float(ax[0]), float(ax[1]), float(ax[2])]
            col = _matvec(r9, axl, 3, 3)
            s_ang = [col[0], 0.0, 0.0, col[1], 0.0, 0.0, col[2], 0.0, 0.0]
            qd3 = [dv_c[o], 0.0, 0.0]
            d = 1
        else:  # FIXED
            s_ang = _mat(3, 3)
            qd3 = [0.0, 0.0, 0.0]
            d = 0
        dof_sel.append((o, d))
        s_mats[j] = s_ang + _mat(3, 3)     # 6x3: [S_ang; 0]
        w_j = _matvec(s_ang, qd3, 3, 3)
        vj = w_j + [0.0, 0.0, 0.0]
        c_bias[j] = _cross_motion(v[j], vj)

    # --- spatial inertias + bias forces ---------------------------------
    ia: List = [None] * nb
    pa: List = [None] * nb
    for j in range(nb):
        r9 = body_r[j]
        mass = float(model.body_mass[j])
        com = [float(c) for c in np.asarray(model.body_com[j])]
        i_loc = [float(x) for x in np.asarray(model.body_inertia[j]).ravel()]
        com_w = _matvec(r9, com, 3, 3)
        i_w = _matmul(_matmul(r9, i_loc, 3, 3, 3), _mat_t(r9, 3, 3), 3, 3, 3)
        cx = _skew(com_w)
        cxcxt = _matmul(cx, _mat_t(cx, 3, 3), 3, 3, 3)
        tl = _add(i_w, _scale(cxcxt, mass))
        tr = _scale(cx, mass)
        bl = _mat_t(tr, 3, 3)
        m66 = []
        for i in range(3):
            m66.extend(tl[i * 3:i * 3 + 3])
            m66.extend(tr[i * 3:i * 3 + 3])
        for i in range(3):
            m66.extend(bl[i * 3:i * 3 + 3])
            m66.extend([mass if i == k else 0.0 for k in range(3)])
        ia[j] = m66
        iv = _matvec(m66, v[j], 6, 6)
        fj = f_ext_c[j]
        pa[j] = _sub(_cross_force(v[j], iv), fj)

    # --- inward pass ------------------------------------------------------
    u_list: List = [None] * nb
    d_inv: List = [None] * nb
    uu: List = [None] * nb
    for j in range(nb - 1, 0, -1):
        parent = model.parent_indices[j]
        o, d = dof_sel[j - 1]
        r = [pos[j][k] - pos[parent][k] for k in range(3)]
        if d == 0:
            ia_sh = _shift_inertia(ia[j], r)
            pa_sh = _shift_force(
                _add(pa[j], _matvec(ia[j], c_bias[j], 6, 6)), r)
            ia[parent] = _add(ia[parent], ia_sh)
            pa[parent] = _add(pa[parent], pa_sh)
            continue
        s = s_mats[j]
        u = _matmul(ia[j], s, 6, 6, 3)               # 6x3
        dmat = _matmul(_mat_t(s, 6, 3), u, 3, 6, 3)  # 3x3
        arm = [0.0] * 3
        for k in range(d):
            arm[k] = float(model.dof_armature[o + k]) + dex_c[o + k]
        for k in range(3):
            pad = 0.0 if k < d else 1.0
            dmat[k * 3 + k] = _addx(dmat[k * 3 + k], _addx(arm[k], pad))
        tau3 = [tau_c[o + k] if k < d else 0.0 for k in range(3)]
        st_pa = _matvec(_mat_t(s, 6, 3), pa[j], 3, 6)
        u_bias = _sub(tau3, st_pa)
        dinv, _ = _inv3_cols(dmat)
        ud = _matmul(u, dinv, 6, 3, 3)
        ia_art = _sub(ia[j], _matmul(ud, _mat_t(u, 6, 3), 6, 3, 6))
        pa_art = _add(_add(pa[j], _matvec(ia_art, c_bias[j], 6, 6)),
                      _matvec(ud, u_bias, 6, 3))
        ia[parent] = _add(ia[parent], _shift_inertia(ia_art, r))
        pa[parent] = _add(pa[parent], _shift_force(pa_art, r))
        u_list[j] = u
        d_inv[j] = dinv
        uu[j] = u_bias

    # --- root solve -------------------------------------------------------
    g = params.gravity
    a_base = [0.0, 0.0, 0.0, 0.0, 0.0, -g]
    ia0 = list(ia[0])
    for k in range(6):
        ia0[k * 6 + k] = ia0[k * 6 + k] + 1e-6
    rhs = [_addx(-pa[0][k], g * ia[0][k * 6 + 5]) for k in range(6)]
    root_acc = _solve6_sym(ia0, rhs)

    # --- outward pass -----------------------------------------------------
    a: List = [None] * nb
    a[0] = _add(a_base, root_acc)
    qdd_c = [None] * model.dof_size
    for j in range(1, nb):
        parent = model.parent_indices[j]
        o, d = dof_sel[j - 1]
        r = [pos[j][k] - pos[parent][k] for k in range(3)]
        a_p = _add(_shift_motion(a[parent], r), c_bias[j])
        if d == 0:
            a[j] = a_p
            continue
        ua = _matvec(_mat_t(u_list[j], 6, 3), a_p, 3, 6)
        qdd3 = _matvec(d_inv[j], _sub(uu[j], ua), 3, 3)
        for k in range(d):
            qdd_c[o + k] = qdd3[k]
        a[j] = _add(a_p, _matvec(s_mats[j], qdd3, 6, 3))

    qdd_c = [0.0 if c is None else c for c in qdd_c]
    return root_acc, qdd_c


# ---------------------------------------------------------------------------
# SoA kinematics refresh + integration (same layout rationale as aba_soa)
# ---------------------------------------------------------------------------


def _quat_mul_cols(a, b) -> list:
    """[x,y,z,w] column quaternion product a*b."""
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return [aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz]


def _quat_rotate_cols(q, v) -> list:
    """Rotate column 3-vector v by column quaternion q."""
    qv = q[0:3]
    t = _cross3(qv, v)
    t = [2.0 * x for x in t]
    return _add(_add(v, [q[3] * x for x in t]), _cross3(qv, t))


def _exp_map_to_quat_cols(e) -> list:
    angle2 = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
    angle = jnp.sqrt(angle2 + 1e-24)
    half = 0.5 * angle
    s = jnp.sin(half) / angle
    return [e[0] * s, e[1] * s, e[2] * s, jnp.cos(half)]


def _quat_normalize_cols(q) -> list:
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
                 + 1e-24)
    inv = 1.0 / n
    return [q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv]


def refresh_kinematics_soa(model: cm.CharModel, state):
    """FK + world body velocities in column form (replaces
    engine.refresh_kinematics's batch-major per-joint quat loops)."""
    joint_rot_c = [_cols(state.joint_rot[..., j, :], 4)
                   for j in range(model.num_bodies - 1)]
    pos, quat, lin, ang = fk_vel_cols(
        model, _cols(state.root_pos, 3), _cols(state.root_rot, 4),
        joint_rot_c, _cols(state.root_vel, 3),
        _cols(state.root_ang_vel, 3), _cols(state.dof_vel, model.dof_size))

    batch = state.root_pos.shape[:-1]
    dtype = state.root_pos.dtype

    def stack(cols_list, k):
        rows = []
        for cols in cols_list:
            rows.append(jnp.stack(
                [jnp.broadcast_to(jnp.asarray(c, dtype), batch)
                 for c in cols], axis=-1))
        return jnp.stack(rows, axis=-2)

    return state.replace(
        body_pos=stack(pos, 3), body_rot=stack(quat, 4),
        body_vel=stack(lin, 3), body_ang_vel=stack(ang, 3))


def fk_vel_cols(model: cm.CharModel, root_pos, root_rot, joint_rot_c,
                root_vel, root_ang_vel, dv):
    """Column-level FK + body velocities core (shape-agnostic, reusable
    inside a Pallas kernel).  Returns (pos, quat, lin, ang) — lists over
    bodies of lists of columns."""
    nb = model.num_bodies
    # joint world angular rates: w_world[j] = R_body[j] @ (dof_map[j] @ qd)
    pos = [list(root_pos)]
    quat = [list(root_rot)]
    ang = [list(root_ang_vel)]
    lin = [list(root_vel)]
    dof_map = np.asarray(model.dof_map)  # (J-1, 3, D) static

    for j in range(1, nb):
        parent = model.parent_indices[j]
        lt = [float(x) for x in np.asarray(model.local_translation[j])]
        lr = [float(x) for x in np.asarray(model.local_rotation[j])]
        jq = joint_rot_c[j - 1]
        # world rotation/translation
        cur = _quat_mul_cols(lr, jq)
        q_w = _quat_mul_cols(quat[parent], cur)  # no normalize: parity
        # with cm.forward_kinematics (joint_rot is normalized upstream)
        t_w = _quat_rotate_cols(quat[parent], lt)
        p_w = _add(pos[parent], t_w)
        pos.append(p_w)
        quat.append(q_w)
        # velocities
        w_local = [None] * 3
        for k in range(3):
            acc = None
            for d in range(model.dof_size):
                c = float(dof_map[j - 1, k, d])
                if c == 0.0:
                    continue
                term = dv[d] * c if c != 1.0 else dv[d]
                acc = term if acc is None else acc + term
            w_local[k] = 0.0 if acc is None else acc
        w_world = _quat_rotate_cols(q_w, w_local)
        w = _add(ang[parent], w_world)
        r = _sub(p_w, pos[parent])
        v = _add(lin[parent], _cross3(ang[parent], r))
        ang.append(w)
        lin.append(v)

    return pos, quat, lin, ang
