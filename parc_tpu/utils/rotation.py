"""Quaternion / exp-map / rotation algebra for TPU (JAX).

Conventions (behaviorally compatible with the reference framework's
``util/torch_util.py``):

* Quaternions are stored ``(x, y, z, w)``.
* Exponential maps are ``axis * angle`` 3-vectors.
* ``calc_heading`` is the yaw of the rotated x-axis.
* Tangent-normal ("6D") rotation features are the rotated x-axis followed by
  the rotated negative... (see :func:`quat_to_tan_norm`).

Everything here is a pure function of ``jnp`` arrays, broadcastable over
arbitrary leading batch dimensions, jit/vmap/grad-safe (norms are guarded so
gradients at the identity are finite).

Reference parity: util/torch_util.py:5-676.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def normalize_angle(x: jax.Array) -> jax.Array:
    """Wrap angles to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def normalize(x: jax.Array, eps: float = _EPS) -> jax.Array:
    """Normalize the last axis, guarding against zero vectors."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def _safe_norm(x: jax.Array, eps: float = _EPS) -> jax.Array:
    """Norm of the last axis with non-NaN gradient at 0."""
    sq = jnp.sum(x * x, axis=-1)
    # sqrt has infinite grad at 0; clamp the squared norm instead.
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def normalize_exp_map(exp_map: jax.Array) -> jax.Array:
    """Re-wrap an exp-map so its angle lies in (-pi, pi]."""
    angle = _safe_norm(exp_map)
    norm_angle = normalize_angle(angle)
    scale = norm_angle / angle
    return exp_map * scale[..., None]


def quat_unit(q: jax.Array) -> jax.Array:
    return normalize(q)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_pos(q: jax.Array) -> jax.Array:
    """Flip quaternion sign so that w >= 0."""
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_normalize(q: jax.Array) -> jax.Array:
    """Unit quaternion with positive w."""
    return quat_unit(quat_pos(q))


def quat_abs(q: jax.Array) -> jax.Array:
    return _safe_norm(q)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, xyzw layout."""
    ax, ay, az, aw = jnp.split(a, 4, axis=-1)
    bx, by, bz, bw = jnp.split(b, 4, axis=-1)
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by - ax * bz + ay * bw + az * bx
    z = aw * bz + ax * by - ay * bx + az * bw
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.concatenate([x, y, z, w], axis=-1)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q."""
    q_v = q[..., :3]
    q_w = q[..., 3:4]
    t = 2.0 * jnp.cross(q_v, v)
    return v + q_w * t + jnp.cross(q_v, t)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conjugate(q), v)


def quat_inv(q: jax.Array) -> jax.Array:
    return quat_conjugate(quat_normalize(q))


def quat_diff(q0: jax.Array, q1: jax.Array) -> jax.Array:
    """q1 * q0^-1 — the WORLD-frame rotation taking q0 to q1 (reference:
    util/torch_util.py:423-425). Finite-difference angular velocities built
    from this match the simulator's world-frame root_ang_vel; the local
    variant (q0^-1 * q1) silently put reference ang-vels in the body frame,
    skewing the deepmimic root-velocity reward against the world-frame sim
    state."""
    return quat_mul(q1, quat_conjugate(q0))


def quat_diff_angle(q0: jax.Array, q1: jax.Array) -> jax.Array:
    """Geodesic angle between two rotations (always >= 0)."""
    dq = quat_normalize(quat_diff(q0, q1))
    im = _safe_norm(dq[..., :3])
    re = jnp.abs(dq[..., 3])
    return 2.0 * jnp.arctan2(im, re)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    theta = (angle / 2.0)[..., None]
    xyz = normalize(axis) * jnp.sin(theta)
    w = jnp.cos(theta)
    return quat_unit(jnp.concatenate([xyz, w], axis=-1))


def quat_to_axis_angle(q: jax.Array, eps: float = 1e-5):
    """Return (axis, angle) with angle >= 0 and default z-axis at identity."""
    q = quat_pos(q)
    length = _safe_norm(q[..., 0:3])
    angle = 2.0 * jnp.arctan2(length, q[..., 3])
    axis = q[..., 0:3] / length[..., None]
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    mask = length > eps
    angle = jnp.where(mask, angle, jnp.zeros_like(angle))
    axis = jnp.where(mask[..., None], axis, default_axis)
    return axis, angle


def quat_to_exp_map(q: jax.Array) -> jax.Array:
    axis, angle = quat_to_axis_angle(q)
    return axis * angle[..., None]


def axis_angle_to_exp_map(axis: jax.Array, angle: jax.Array) -> jax.Array:
    return axis * angle[..., None]


def exp_map_to_axis_angle(exp_map: jax.Array, eps: float = 1e-5):
    angle = _safe_norm(exp_map)
    axis = exp_map / angle[..., None]
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    mask = angle > eps
    out_angle = jnp.where(mask, angle, jnp.zeros_like(angle))
    out_axis = jnp.where(mask[..., None], axis, default_axis)
    return out_axis, out_angle


def exp_map_to_quat(exp_map: jax.Array) -> jax.Array:
    axis, angle = exp_map_to_axis_angle(exp_map)
    return axis_angle_to_quat(axis, angle)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    i, j, k, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    m = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * w),
            two_s * (i * k + j * w),
            two_s * (i * j + k * w),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * w),
            two_s * (i * k - j * w),
            two_s * (j * k + i * w),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (xyzw), branchless Shepperd's method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    tr = m00 + m11 + m22
    qw0 = _sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0), qw0], axis=-1)
    qx1 = _sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1),
                    (m21 - m12) / (4 * qx1)], axis=-1)
    qy2 = _sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2),
                    (m02 - m20) / (4 * qy2)], axis=-1)
    qz3 = _sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3,
                    (m10 - m01) / (4 * qz3)], axis=-1)

    # pick the numerically best branch
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q_neg = jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3))
    q = jnp.where((tr > 0.0)[..., None], q0, q_neg)
    return quat_normalize(q)


def matrix_to_exp_map(m: jax.Array) -> jax.Array:
    return quat_to_exp_map(matrix_to_quat(m))


def quat_to_tan_norm(q: jax.Array) -> jax.Array:
    """6D rotation feature: rotated x (tangent) and z (normal) axes."""
    ref_tan = jnp.zeros_like(q[..., 0:3]).at[..., 0].set(1.0)
    ref_norm = jnp.zeros_like(q[..., 0:3]).at[..., 2].set(1.0)
    tan = quat_rotate(q, ref_tan)
    norm = quat_rotate(q, ref_norm)
    return jnp.concatenate([tan, norm], axis=-1)


def tan_norm_to_matrix(tan_norm: jax.Array) -> jax.Array:
    tan = normalize(tan_norm[..., 0:3])
    norm = tan_norm[..., 3:6]
    norm = normalize(norm - jnp.sum(tan * norm, axis=-1, keepdims=True) * tan)
    binorm = jnp.cross(norm, tan)
    return jnp.stack([tan, binorm, norm], axis=-1)


def tan_norm_to_quat(tan_norm: jax.Array) -> jax.Array:
    return matrix_to_quat(tan_norm_to_matrix(tan_norm))


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation; t broadcasts against batch dims of q0/q1."""
    cos_half = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where((cos_half < 0)[..., None], -q1, q1)
    cos_half = jnp.abs(cos_half)[..., None]
    cos_half_c = jnp.clip(cos_half, -1.0, 1.0)
    half_theta = jnp.arccos(cos_half_c)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half_c * cos_half_c, 1e-12))

    if t.ndim == q0.ndim - 1:
        t = t[..., None]
    ratio_a = jnp.sin((1.0 - t) * half_theta) / sin_half
    ratio_b = jnp.sin(t * half_theta) / sin_half
    out = ratio_a * q0 + ratio_b * q1
    out = jnp.where(jnp.abs(sin_half) < 1e-3, 0.5 * q0 + 0.5 * q1, out)
    out = jnp.where(cos_half >= 1.0, q0, out)
    return out


def calc_heading(q: jax.Array) -> jax.Array:
    """Yaw of the rotated x axis."""
    ref_dir = jnp.zeros_like(q[..., 0:3]).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def heading_to_quat(heading: jax.Array) -> jax.Array:
    axis = jnp.zeros(heading.shape + (3,), dtype=heading.dtype).at[..., 2].set(1.0)
    return axis_angle_to_quat(axis, heading)


def calc_heading_quat(q: jax.Array) -> jax.Array:
    return heading_to_quat(calc_heading(q))


def calc_heading_quat_inv(q: jax.Array) -> jax.Array:
    return heading_to_quat(-calc_heading(q))


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def euler_xyz_to_exp_map(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    return quat_to_exp_map(quat_from_euler_xyz(roll, pitch, yaw))


def quat_integrate_angular_velocity(ang_vel: jax.Array, q: jax.Array, dt) -> jax.Array:
    """q(t+dt) from world-frame angular velocity (first-order exp)."""
    dq = exp_map_to_quat(ang_vel * dt)
    return quat_normalize(quat_mul(dq, q))


def quat_differentiate_angular_velocity(q_next: jax.Array, q_curr: jax.Array, dt) -> jax.Array:
    """World-frame angular velocity taking q_curr to q_next over dt."""
    dq = quat_normalize(quat_mul(q_next, quat_conjugate(q_curr)))
    return quat_to_exp_map(dq) / dt


def rotate_2d_vec(vec: jax.Array, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = c * vec[..., 0] - s * vec[..., 1]
    y = s * vec[..., 0] + c * vec[..., 1]
    return jnp.stack([x, y], axis=-1)


def heading_angle_from_xy(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.arctan2(y, x)


def quat_diff_vec(v0: jax.Array, v1: jax.Array) -> jax.Array:
    """Shortest-arc quaternion rotating v0 onto v1."""
    v0 = normalize(v0)
    v1 = normalize(v1)
    xyz = jnp.cross(v0, v1)
    w = 1.0 + jnp.sum(v0 * v1, axis=-1, keepdims=True)
    q = jnp.concatenate([xyz, w], axis=-1)
    # antiparallel fallback: rotate pi about any perpendicular axis
    perp = jnp.cross(v0, jnp.zeros_like(v0).at[..., 2].set(1.0))
    perp = jnp.where(_safe_norm(perp)[..., None] < 1e-6,
                     jnp.cross(v0, jnp.zeros_like(v0).at[..., 1].set(1.0)), perp)
    anti = jnp.concatenate([normalize(perp), jnp.zeros_like(w)], axis=-1)
    q = jnp.where(w < 1e-6, anti, q)
    return quat_unit(q)


def rotate_quat_by_heading(heading: jax.Array, q: jax.Array) -> jax.Array:
    return quat_mul(heading_to_quat(heading), q)


def rotate_exp_map_by_heading(heading: jax.Array, exp_map: jax.Array) -> jax.Array:
    return quat_to_exp_map(rotate_quat_by_heading(heading, exp_map_to_quat(exp_map)))
