"""TPU-friendly batched heightfield gathers.

XLA lowers general gathers on TPU to a serial scalar loop — at the tracker's
scale (4096 envs x 441 ray points per step) that costs ~20 ms/step, 20x the
rest of the observation pipeline. For small tables (per-motion terrain
grids), rewriting the gather as two one-hot contractions puts the work on
the MXU instead: measured 1.2 ms for the same shape on TPU v5e.

out[n, p] = hf[t[n], ix[n, p], iy[n, p]]
          = sum_i oh_x[n,p,i] * sum_w ( sum_m oh_t[n,m] hf[m,i,w] ) oh_y[n,p,w]

Used by the env observation path (parc_tpu/envs/obs.py) and anywhere else
that samples many points per env from per-env terrain tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batched_hf_gather(hf: jax.Array, terrain_idx: jax.Array, ix: jax.Array,
                      iy: jax.Array, min_points_for_onehot: int = 32
                      ) -> jax.Array:
    """hf[terrain_idx[n], ix[n, p], iy[n, p]] -> (N, P).

    hf: (M, H, W); terrain_idx: (N,) int; ix/iy: (N, P) int (already
    clipped in-bounds). Dispatches to the one-hot MXU path when P is large
    enough to amortize it; falls back to a plain gather otherwise.
    """
    hf = jnp.asarray(hf)
    lead = ix.shape[:-1]
    p = ix.shape[-1]
    m, h, w = hf.shape
    if p < min_points_for_onehot:
        return hf[terrain_idx[..., None], ix, iy]
    ix = ix.reshape((-1, p))
    iy = iy.reshape((-1, p))
    terrain_idx = terrain_idx.reshape((-1,))
    # f32 one-hots measured as fast as bf16 on v5e and keep exact heights
    # (one-hot contraction is exact: one nonzero per row)
    oh_t = jax.nn.one_hot(terrain_idx, m, dtype=hf.dtype)      # (N, M)
    hf_sel = jnp.einsum("nm,mhw->nhw", oh_t, hf)
    oh_y = jax.nn.one_hot(iy, w, dtype=hf.dtype)               # (N, P, W)
    tmp = jnp.einsum("npw,nhw->nph", oh_y, hf_sel)             # (N, P, H)
    oh_x = jax.nn.one_hot(ix, h, dtype=hf.dtype)               # (N, P, H)
    return jnp.sum(tmp * oh_x, axis=-1).reshape(lead + (p,))


def rows_onehot(table: jax.Array, idx: jax.Array,
                oh: jax.Array | None = None) -> jax.Array:
    """table[idx] as a one-hot MXU contraction: ``one_hot(idx) @ table``.

    table: (F, ...); idx: int (...). Exact (one nonzero per one-hot row —
    1.0*x selections accumulate exactly even through the MXU's bf16x3 f32
    emulation). Pass a precomputed ``oh`` (L, F) to share the one-hot
    across several tables of the same length (XLA CSEs it anyway, but this
    keeps the graph small).

    Callers dispatch on table size: the contraction costs L*F*W MACs, so it
    only beats XLA's serial scalar gather loop for small-F tables (motion
    frame tables of a few thousand frames; per-motion terrain stacks).
    """
    lead = idx.shape
    f = table.shape[0]
    if oh is None:
        oh = jax.nn.one_hot(idx.reshape(-1), f, dtype=table.dtype)
    flat = table.reshape((f, -1))
    out = oh @ flat
    return out.reshape(lead + table.shape[1:])


def hf_gather_single(hf: jax.Array, ix: jax.Array, iy: jax.Array,
                     min_points_for_onehot: int = 32) -> jax.Array:
    """hf[ix[..., p], iy[..., p]] for a single shared (H, W) table."""
    hf = jnp.asarray(hf)
    lead = ix.shape[:-1]
    p = ix.shape[-1]
    h, w = hf.shape
    if p < min_points_for_onehot:
        return hf[ix, iy]
    ix = ix.reshape((-1, p))
    iy = iy.reshape((-1, p))
    oh_y = jax.nn.one_hot(iy, w, dtype=hf.dtype)               # (N, P, W)
    tmp = jnp.einsum("npw,hw->nph", oh_y, hf)                  # (N, P, H)
    oh_x = jax.nn.one_hot(ix, h, dtype=hf.dtype)
    return jnp.sum(tmp * oh_x, axis=-1).reshape(lead + (p,))
