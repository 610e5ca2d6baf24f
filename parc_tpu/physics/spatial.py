"""Batched 6-D spatial vector algebra (world-axis, per-body-origin frames).

Spatial motion vectors are (angular; linear) 6-vectors; force vectors are
(moment; force).  All quantities are expressed in world axes at a stated
origin; transports between origins are pure translations, which keeps the
Featherstone passes free of rotation bookkeeping (rotations enter only
through the joint motion subspaces and per-body inertia).

Everything broadcasts over arbitrary leading batch dimensions so a single
call handles 4096 environments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([o, -z, y], -1),
        jnp.stack([z, o, -x], -1),
        jnp.stack([-y, x, o], -1),
    ], -2)


def motion(ang: jax.Array, lin: jax.Array) -> jax.Array:
    return jnp.concatenate([ang, lin], axis=-1)


def ang(m: jax.Array) -> jax.Array:
    return m[..., 0:3]


def lin(m: jax.Array) -> jax.Array:
    return m[..., 3:6]


def cross_motion(v: jax.Array, m: jax.Array) -> jax.Array:
    """v x_m m (motion-cross-motion)."""
    w, u = v[..., 0:3], v[..., 3:6]
    mw, mu = m[..., 0:3], m[..., 3:6]
    return motion(jnp.cross(w, mw), jnp.cross(w, mu) + jnp.cross(u, mw))


def cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
    """v x* f (motion-cross-force)."""
    w, u = v[..., 0:3], v[..., 3:6]
    n, fo = f[..., 0:3], f[..., 3:6]
    return motion(jnp.cross(w, n) + jnp.cross(u, fo), jnp.cross(w, fo))


def shift_motion(m: jax.Array, r: jax.Array) -> jax.Array:
    """Transport a motion vector from origin o to origin o + r."""
    w, u = m[..., 0:3], m[..., 3:6]
    return motion(w, u + jnp.cross(w, r))


def shift_force(f: jax.Array, r: jax.Array) -> jax.Array:
    """Transport a force vector from origin o + r to origin o.

    (The moment picks up r x f.)
    """
    n, fo = f[..., 0:3], f[..., 3:6]
    return motion(n + jnp.cross(r, fo), fo)


def shift_inertia(ia: jax.Array, r: jax.Array) -> jax.Array:
    """Transport a 6x6 articulated inertia from origin o + r to origin o.

    If f_child = IA v_child with quantities at the child origin, the
    equivalent inertia at the parent origin is X_F(r) @ IA @ X_M(-r) where
    X_M maps parent-origin motion to child-origin motion.
    """
    rx = skew(r)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=ia.dtype), rx.shape)
    zero = jnp.zeros_like(rx)
    # X_F = [[1, rx], [0, 1]] ; X_M = [[1, 0], [-rx, 1]]
    xf = jnp.concatenate([
        jnp.concatenate([eye, rx], -1),
        jnp.concatenate([zero, eye], -1),
    ], -2)
    xm = jnp.concatenate([
        jnp.concatenate([eye, zero], -1),
        jnp.concatenate([-rx, eye], -1),
    ], -2)
    return xf @ ia @ xm


def spatial_inertia(mass: jax.Array, com: jax.Array,
                    inertia_com: jax.Array) -> jax.Array:
    """6x6 spatial inertia about the body origin, world axes.

    Args:
      mass: (...,) body mass.
      com: (..., 3) com offset from the body origin (world axes).
      inertia_com: (..., 3, 3) rotational inertia about the com (world axes).
    """
    cx = skew(com)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=com.dtype), cx.shape)
    top_left = inertia_com + m * (cx @ cx.swapaxes(-1, -2))
    top_right = m * cx
    bot_left = m * cx.swapaxes(-1, -2)
    bot_right = m * eye
    return jnp.concatenate([
        jnp.concatenate([top_left, top_right], -1),
        jnp.concatenate([bot_left, bot_right], -1),
    ], -2)
