"""Running observation normalizer as a pytree.

Accumulates mean/second-moment statistics; segments flagged non-normalized
(heightfield, contacts) pass through untouched.  Cross-device reduction of
the accumulators happens with ``psum`` when an axis name is given — the
SPMD replacement of the reference's torch.distributed reduction
(reference: learning/normalizer.py:29-58).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NormalizerState:
    mean: jax.Array       # (D,)
    var: jax.Array        # (D,)
    count: jax.Array      # ()
    # 1.0 where the feature is normalized, 0.0 where passthrough
    norm_mask: jax.Array  # (D,)
    clip: float = struct.field(pytree_node=False, default=10.0)
    sample_limit: float = struct.field(pytree_node=False, default=3e8)


def create(dim: int, norm_mask=None, clip: float = 10.0,
           sample_limit: float = 3e8) -> NormalizerState:
    return NormalizerState(
        mean=jnp.zeros((dim,)),
        var=jnp.ones((dim,)),
        count=jnp.zeros(()),
        norm_mask=(jnp.ones((dim,)) if norm_mask is None
                   else jnp.asarray(norm_mask, jnp.float32)),
        clip=clip, sample_limit=sample_limit)


def update(state: NormalizerState, batch: jax.Array,
           axis_name: Optional[str] = None) -> NormalizerState:
    """Fold a batch of observations (any leading dims) into the stats."""
    x = batch.reshape(-1, batch.shape[-1])
    n = jnp.asarray(x.shape[0], jnp.float32)
    s1 = jnp.sum(x, axis=0)
    s2 = jnp.sum(x * x, axis=0)
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    new_count = state.count + n
    # merge via moment accumulation
    old_s1 = state.mean * state.count
    old_s2 = (state.var + state.mean**2) * state.count
    mean = (old_s1 + s1) / new_count
    var = jnp.maximum((old_s2 + s2) / new_count - mean**2, 1e-5)
    # freeze after sample_limit (reference: normalizer_samples budget)
    frozen = state.count >= state.sample_limit
    return state.replace(
        mean=jnp.where(frozen, state.mean, mean),
        var=jnp.where(frozen, state.var, var),
        count=jnp.where(frozen, state.count, new_count))


def normalize(state: NormalizerState, x: jax.Array) -> jax.Array:
    std = jnp.sqrt(state.var)
    normed = (x - state.mean) / std
    normed = jnp.clip(normed, -state.clip, state.clip)
    return jnp.where(state.norm_mask > 0, normed, x)


def unnormalize(state: NormalizerState, x: jax.Array) -> jax.Array:
    return jnp.where(state.norm_mask > 0,
                     x * jnp.sqrt(state.var) + state.mean, x)
