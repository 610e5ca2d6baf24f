"""Heightfield terrain for TPU.

Device side: a ``Terrain`` pytree (static-shape heightfield grid + mask +
augmentation bounds) with pure-JAX lookups, sampling, and SDF queries — the
geometry the physics backend collides against directly (the reference only
voxelizes heightfields into trimeshes because PhysX consumes meshes;
reference: util/terrain_util.py:1099-1251).

Host side: numpy procedural generation (boxes / stairs / curvy paths /
perlin) mirroring the reference generators (reference:
util/terrain_util.py:320-1097), used by the kinematic-generation pipeline.

Grid conventions (parity with reference util/terrain_util.py:21-258):
* ``hf[i, j]`` is the height of the cell whose *center* is at
  ``min_point + (i, j) * dxdy``; points map to cells by rounding.
* ``hf_mask`` marks cells protected from augmentation (touched by a motion).
* ``hf_maxmin[..., 0] / [..., 1]`` are per-cell max/min allowed heights for
  augmentation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Terrain:
    hf: jax.Array          # (H, W) float heights
    hf_mask: jax.Array     # (H, W) bool
    hf_maxmin: jax.Array   # (H, W, 2) max/min augmentation heights
    min_point: jax.Array   # (2,) world xy of cell (0, 0) center
    dxdy: jax.Array        # (2,) cell size

    @property
    def dims(self) -> Tuple[int, int]:
        return self.hf.shape[-2], self.hf.shape[-1]

    @property
    def max_point(self) -> jax.Array:
        dims = jnp.asarray(self.dims, self.min_point.dtype)
        return self.min_point + (dims - 1) * self.dxdy


def create_terrain(x_dim: int = 16, y_dim: int = 16, dx: float = 0.4,
                   dy: Optional[float] = None, min_x: float = 0.0,
                   min_y: float = 0.0, height: float = 0.0,
                   dtype=jnp.float32) -> Terrain:
    dy = dx if dy is None else dy
    return Terrain(
        hf=jnp.full((x_dim, y_dim), height, dtype),
        hf_mask=jnp.zeros((x_dim, y_dim), bool),
        hf_maxmin=jnp.stack(
            [jnp.full((x_dim, y_dim), height + 3.0, dtype),
             jnp.full((x_dim, y_dim), height - 3.0, dtype)], axis=-1),
        min_point=jnp.asarray([min_x, min_y], dtype),
        dxdy=jnp.asarray([dx, dy], dtype),
    )


# ---------------------------------------------------------------------------
# Lookups (pure JAX)
# ---------------------------------------------------------------------------


def get_grid_index(terrain: Terrain, points_xy: jax.Array) -> jax.Array:
    """Nearest-cell indices for world xy points, clamped in-bounds."""
    inds = jnp.round((points_xy - terrain.min_point) / terrain.dxdy)
    dims = jnp.asarray(terrain.dims)
    return jnp.clip(inds.astype(jnp.int32), 0, dims - 1)


def get_hf_val(terrain: Terrain, points_xy: jax.Array) -> jax.Array:
    """Nearest-cell height lookup (matches the reference observation path)."""
    inds = get_grid_index(terrain, points_xy)
    return jnp.asarray(terrain.hf)[inds[..., 0], inds[..., 1]]


def get_hf_val_bilinear(terrain: Terrain, points_xy: jax.Array) -> jax.Array:
    """Bilinear height interpolation (smoother contact normals for physics)."""
    uv = (points_xy - terrain.min_point) / terrain.dxdy
    dims = jnp.asarray(terrain.dims)
    uv = jnp.clip(uv, 0.0, (dims - 1).astype(uv.dtype))
    i0 = jnp.floor(uv).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, dims - 1)
    f = uv - i0
    hf = jnp.asarray(terrain.hf)
    h00 = hf[i0[..., 0], i0[..., 1]]
    h10 = hf[i1[..., 0], i0[..., 1]]
    h01 = hf[i0[..., 0], i1[..., 1]]
    h11 = hf[i1[..., 0], i1[..., 1]]
    fx, fy = f[..., 0], f[..., 1]
    return ((1 - fx) * (1 - fy) * h00 + fx * (1 - fy) * h10
            + (1 - fx) * fy * h01 + fx * fy * h11)


def stack_terrains(terrains) -> Terrain:
    """Stack R terrains into one hf (R, H, W) Terrain (edge-padded to the
    largest grid; per-terrain (R, 2) min_point).  dxdy must match.

    Rows of a batch can then look up DIFFERENT terrains in one MXU-friendly
    program (:func:`get_hf_val_stacked` / the stacked ``sample_local_hf``
    path in diffusion/gen.py) — the TPU answer to per-clip terrains in
    batched kin-gen / motion optimization."""
    import numpy as np
    dx0 = np.asarray(terrains[0].dxdy)
    h = max(int(t.hf.shape[0]) for t in terrains)
    w = max(int(t.hf.shape[1]) for t in terrains)
    hfs, mps = [], []
    for t in terrains:
        assert np.allclose(np.asarray(t.dxdy), dx0), "dxdy must match"
        hf = np.asarray(t.hf, np.float32)
        hf = np.pad(hf, [(0, h - hf.shape[0]), (0, w - hf.shape[1])],
                    mode="edge")
        hfs.append(hf)
        mps.append(np.asarray(t.min_point, np.float32))
    hf = jnp.asarray(np.stack(hfs))
    return Terrain(
        hf=hf, hf_mask=jnp.zeros(hf.shape, bool),
        hf_maxmin=jnp.stack([hf + 3.0, hf - 3.0], -1),
        min_point=jnp.asarray(np.stack(mps)), dxdy=jnp.asarray(dx0))


def _stacked_uv(stacked: Terrain, terrain_idx: jax.Array,
                points_xy: jax.Array) -> jax.Array:
    """Fractional grid coords of world points in their per-row terrain.

    stacked.hf (R, H, W); terrain_idx (N,); points_xy (N, ..., 2)."""
    mp = jnp.asarray(stacked.min_point)
    if mp.ndim == 2:
        mp = mp[terrain_idx]
    mp = mp.reshape((points_xy.shape[0],) + (1,) * (points_xy.ndim - 2)
                    + (2,))
    uv = (points_xy - mp) / stacked.dxdy
    dims = jnp.asarray(stacked.hf.shape[-2:])
    return jnp.clip(uv, 0.0, (dims - 1).astype(uv.dtype))


def get_hf_val_stacked(stacked: Terrain, terrain_idx: jax.Array,
                       points_xy: jax.Array) -> jax.Array:
    """Nearest-cell lookup where each row reads ITS OWN terrain.

    Goes through the one-hot MXU contraction (utils/gather) — native
    gathers serialize on TPU."""
    from parc_tpu.utils import gather as gather_lib
    lead = points_xy.shape[:-1]
    uv = _stacked_uv(stacked, terrain_idx, points_xy)
    inds = jnp.round(uv).astype(jnp.int32).reshape(
        (points_xy.shape[0], -1, 2))
    return gather_lib.batched_hf_gather(
        stacked.hf, terrain_idx, inds[..., 0], inds[..., 1]).reshape(lead)


def get_hf_val_bilinear_stacked(stacked: Terrain, terrain_idx: jax.Array,
                                points_xy: jax.Array) -> jax.Array:
    """Bilinear per-row-terrain lookup (4 one-hot gathers + weights)."""
    from parc_tpu.utils import gather as gather_lib
    lead = points_xy.shape[:-1]
    n = points_xy.shape[0]
    uv = _stacked_uv(stacked, terrain_idx, points_xy).reshape((n, -1, 2))
    dims = jnp.asarray(stacked.hf.shape[-2:])
    i0 = jnp.floor(uv).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, dims - 1)
    f = uv - i0
    g = lambda ix, iy: gather_lib.batched_hf_gather(
        stacked.hf, terrain_idx, ix, iy)
    h00 = g(i0[..., 0], i0[..., 1])
    h10 = g(i1[..., 0], i0[..., 1])
    h01 = g(i0[..., 0], i1[..., 1])
    h11 = g(i1[..., 0], i1[..., 1])
    fx, fy = f[..., 0], f[..., 1]
    out = ((1 - fx) * (1 - fy) * h00 + fx * (1 - fy) * h10
           + (1 - fx) * fy * h01 + fx * fy * h11)
    return out.reshape(lead)


def get_point(terrain: Terrain, ij: jax.Array) -> jax.Array:
    """Cell-center world xy from integer grid indices."""
    return terrain.min_point + ij.astype(terrain.min_point.dtype) * terrain.dxdy


def point_hf_penetration(terrain: Terrain, points: jax.Array) -> jax.Array:
    """z distance above the heightfield cell under each point (<0 = below).

    Reference parity: util/terrain_util.py:1540-1557.
    """
    return points[..., 2] - get_hf_val(terrain, points[..., 0:2])


# ---------------------------------------------------------------------------
# Observation sampling
# ---------------------------------------------------------------------------


def local_grid_points(center_xy: jax.Array, heading: jax.Array,
                      num_x: int, num_y: int, dx: float, dy: float,
                      center_offset_x: float = 0.0) -> jax.Array:
    """Heading-rotated regular xy sample grid around a character.

    Returns (..., num_x * num_y, 2) world points. Used for the MDM local
    31x31 heightfield window and grid-style env observations.
    """
    xs = (jnp.arange(num_x) - (num_x - 1) / 2.0) * dx + center_offset_x
    ys = (jnp.arange(num_y) - (num_y - 1) / 2.0) * dy
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (P, 2)
    c, s = jnp.cos(heading)[..., None], jnp.sin(heading)[..., None]
    rx = c * pts[..., 0] - s * pts[..., 1]
    ry = s * pts[..., 0] + c * pts[..., 1]
    return jnp.stack([rx, ry], axis=-1) + center_xy[..., None, :]


def cone_ray_points(center_xy: jax.Array, heading: jax.Array,
                    num_rays_behind: int = 2, num_rays_ahead: int = 60,
                    num_cone_rays: int = 3, cone_angle: float = 15.0 * np.pi / 180.0,
                    ray_dx: float = 0.05) -> jax.Array:
    """Cone-of-rays sample pattern ahead of the character.

    A center line of samples from ``-behind`` to ``+ahead`` along the heading
    with ``num_cone_rays`` additional rays fanned out on each side
    (reference: envs/ig_parkour/ig_parkour_env.py:139-155).

    Returns (..., P, 2) world points where
    ``P = (behind + ahead + 1) * (2 * num_cone_rays + 1)``.
    """
    t = jnp.arange(-num_rays_behind, num_rays_ahead + 1) * ray_dx  # (L,)
    angles = (jnp.arange(-num_cone_rays, num_cone_rays + 1)) * cone_angle  # (R,)
    ang = heading[..., None, None] + angles[None, :, None]  # (..., R, 1)
    dist = t[None, None, :]  # broadcast (1, 1, L)
    px = jnp.cos(ang) * dist
    py = jnp.sin(ang) * dist
    pts = jnp.stack([px, py], axis=-1)  # (..., R, L, 2)
    pts = pts.reshape(pts.shape[:-3] + (-1, 2))
    return pts + center_xy[..., None, :]


def sample_hf_obs(terrain: Terrain, points_xy: jax.Array,
                  root_pos: jax.Array) -> jax.Array:
    """Heights at sample points, expressed relative to the root height."""
    h = get_hf_val(terrain, points_xy)
    return h - root_pos[..., 2:3]


# ---------------------------------------------------------------------------
# SDF queries
# ---------------------------------------------------------------------------


def points_boxes_sdf(points: jax.Array, box_centers: jax.Array,
                     box_halfdims: jax.Array) -> jax.Array:
    """SDF from each point to each axis-aligned box.

    points (..., N, 3), box_centers (..., M, 3), box_halfdims (..., M, 3)
    -> (..., N, M).
    """
    d = jnp.abs(points[..., :, None, :] - box_centers[..., None, :, :]) \
        - box_halfdims[..., None, :, :]
    # sqrt(sum^2 + eps), NOT linalg.norm: its gradient at exactly zero is
    # NaN, and optimizers differentiate through this SDF while driving
    # points onto the surface (motion opt, constraint projection, MDM
    # hf-collision loss)
    outside = jnp.sqrt(jnp.sum(jnp.maximum(d, 0.0)**2, axis=-1) + 1e-12)
    inside = jnp.minimum(jnp.max(d, axis=-1), 0.0)
    return outside + inside


def points_hf_sdf(points: jax.Array, hf: jax.Array, hf_min_point: jax.Array,
                  dxdy: jax.Array, base_z: float = -10.0,
                  inverted: bool = True, window: int = 3) -> jax.Array:
    """SDF from points to a heightfield-of-boxes, local-window accelerated.

    Matches reference semantics (util/terrain_util.py:1835-1893) — each cell
    is a box column; ``inverted`` treats the air above as the solid to get
    interior distances — but only evaluates a ``(2*window+1)^2`` neighborhood
    around each point instead of all H*W boxes, turning an O(N*H*W) kernel
    into O(N*w^2) with identical results for |sdf| < window*dx.

    points: (N, 3); hf: (H, W). Returns (N,).
    """
    dims = jnp.asarray(hf.shape)
    k = 2 * window + 1
    ij0 = jnp.round((points[..., 0:2] - hf_min_point) / dxdy).astype(jnp.int32)
    offs = jnp.stack(jnp.meshgrid(jnp.arange(k) - window,
                                  jnp.arange(k) - window,
                                  indexing="ij"), axis=-1).reshape(-1, 2)
    ij = ij0[..., None, :] + offs  # (N, k*k, 2)
    ij = jnp.clip(ij, 0, dims - 1)
    heights = hf[ij[..., 0], ij[..., 1]]  # (N, k*k)
    centers_xy = hf_min_point + ij.astype(points.dtype) * dxdy
    if inverted:
        top_z = -base_z
        z = (heights + top_z) / 2.0
        z_half = (top_z - heights) / 2.0
    else:
        z = (heights + base_z) / 2.0
        z_half = (heights - base_z) / 2.0
    centers = jnp.concatenate([centers_xy, z[..., None]], axis=-1)
    halfdims = jnp.concatenate(
        [jnp.broadcast_to(dxdy / 2.0, centers_xy.shape), z_half[..., None]],
        axis=-1)
    d = jnp.abs(points[..., None, :] - centers) - halfdims
    # NaN-safe norm (see points_boxes_sdf)
    outside = jnp.sqrt(jnp.sum(jnp.maximum(d, 0.0)**2, axis=-1) + 1e-12)
    inside = jnp.minimum(jnp.max(d, axis=-1), 0.0)
    sdf = jnp.min(outside + inside, axis=-1)
    return -sdf if inverted else sdf


def terrain_sdf(terrain: Terrain, points: jax.Array, **kw) -> jax.Array:
    return points_hf_sdf(points, terrain.hf, terrain.min_point, terrain.dxdy, **kw)


# ---------------------------------------------------------------------------
# Pool / simplify ops (JAX; respect hf_maxmin where given)
# ---------------------------------------------------------------------------


def _pool2d(hf: jax.Array, size: int, mode: str) -> jax.Array:
    init = -jnp.inf if mode == "max" else jnp.inf
    op = jax.lax.max if mode == "max" else jax.lax.min
    return jax.lax.reduce_window(
        hf, init, op, (size, size), (1, 1), "SAME")


def maxpool_hf(hf: jax.Array, hf_maxmin: Optional[jax.Array], size: int) -> jax.Array:
    out = _pool2d(hf, size, "max")
    if hf_maxmin is not None:
        out = jnp.clip(out, hf_maxmin[..., 1], hf_maxmin[..., 0])
    return out


def minpool_hf(hf: jax.Array, hf_maxmin: Optional[jax.Array], size: int) -> jax.Array:
    out = _pool2d(hf, size, "min")
    if hf_maxmin is not None:
        out = jnp.clip(out, hf_maxmin[..., 1], hf_maxmin[..., 0])
    return out


def flat_maxpool_2x2(terrain: Terrain) -> Terrain:
    """Snap each 2x2 block to its max height (stabilizes A* planning)."""
    hf = terrain.hf
    h, w = hf.shape
    h2, w2 = h - h % 2, w - w % 2
    blocks = hf[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2)
    pooled = jnp.max(blocks, axis=(1, 3))
    flat = jnp.repeat(jnp.repeat(pooled, 2, axis=0), 2, axis=1)
    hf = hf.at[:h2, :w2].set(flat)
    return terrain.replace(hf=hf)


def flat_maxpool_3x3(terrain: Terrain) -> Terrain:
    """Snap each non-overlapping 3x3 block to its max height; a trailing
    partial block is left untouched (reference: util/terrain_util.py:
    2099-2113, a viewer terrain-edit op)."""
    hf = terrain.hf
    h, w = hf.shape
    h3, w3 = h - h % 3, w - w % 3
    blocks = hf[:h3, :w3].reshape(h3 // 3, 3, w3 // 3, 3)
    pooled = jnp.max(blocks, axis=(1, 3))
    flat = jnp.repeat(jnp.repeat(pooled, 3, axis=0), 3, axis=1)
    return terrain.replace(hf=hf.at[:h3, :w3].set(flat))


def downsample_terrain(terrain: Terrain) -> Terrain:
    """Halve the grid resolution: 2x2 max-pool of heights, OR of the mask,
    doubled cell size (reference: util/terrain_util.py:1631-1673, a viewer
    terrain-edit op).  Unlike the reference (which resets them), the
    augmentation bounds are pooled conservatively (max of maxes / min of
    mins)."""
    h, w = terrain.hf.shape
    h2, w2 = (h // 2) * 2, (w // 2) * 2

    def pool(a, fn):
        return fn(a[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2), axis=(1, 3))

    return Terrain(
        hf=pool(terrain.hf, jnp.max),
        hf_mask=pool(terrain.hf_mask, jnp.any),
        hf_maxmin=jnp.stack([pool(terrain.hf_maxmin[..., 0], jnp.max),
                             pool(terrain.hf_maxmin[..., 1], jnp.min)],
                            axis=-1),
        min_point=terrain.min_point,
        dxdy=terrain.dxdy * 2,
    )


def remove_sharp_lines(hf: np.ndarray, eps: float = 0.1) -> np.ndarray:
    """Smooth single-cell ridges/grooves: a cell strictly above (below) both
    its x- or both its y-neighbours by ``eps`` snaps to the min (max) of its
    4-neighbourhood.  Sequential raster scan like the reference (updated
    cells feed later detections; util/terrain_util.py:260-290, a viewer
    terrain-edit op).  Host numpy — grids are small."""
    hf = np.array(hf, copy=True)
    h, w = hf.shape
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            c = hf[i, j]
            nbrs = (hf[i - 1, j], hf[i + 1, j], hf[i, j - 1], hf[i, j + 1])
            high = ((c > nbrs[0] + eps and c > nbrs[1] + eps)
                    or (c > nbrs[2] + eps and c > nbrs[3] + eps))
            low = ((c < nbrs[0] - eps and c < nbrs[1] - eps)
                   or (c < nbrs[2] - eps and c < nbrs[3] - eps))
            if high:
                hf[i, j] = min(nbrs)
            elif low:
                hf[i, j] = max(nbrs)
    return hf


def flatten_4x4_near_edge(hf: np.ndarray, grid_ind, height: float
                          ) -> np.ndarray:
    """Flatten a 4x4 region around a grid cell to ``height``, aligned so
    the region starts on an even index and the cell sits in its middle 2x2
    (reference: util/terrain_util.py:2115-2133 — applied around A*
    start/end nodes so planning begins on stable footing,
    parc_2_kin_gen.py:304-310)."""
    hf = np.asarray(hf).copy()
    i, j = int(grid_ind[0]), int(grid_ind[1])
    x0 = i - 2 if i % 2 == 0 else i - 1
    y0 = j - 2 if j % 2 == 0 else j - 1
    hf[max(x0, 0):x0 + 4, max(y0, 0):y0 + 4] = height
    return hf


# ---------------------------------------------------------------------------
# Motion-aware masks / augmentation bounds
# ---------------------------------------------------------------------------


def compute_hf_mask_inds(terrain: Terrain, body_points: jax.Array,
                         pad_cells: int = 1) -> jax.Array:
    """Boolean (H, W) mask of cells touched by character body points.

    ``body_points`` is any (..., 3) cloud (e.g. per-frame body positions or
    surface samples over a whole motion). Cells within ``pad_cells`` of a
    touched cell are also marked (reference: util/terrain_util.py:1951-1997).
    """
    mask = jnp.zeros(terrain.dims, bool)
    pts = body_points.reshape(-1, 3)
    ij = get_grid_index(terrain, pts[:, 0:2])
    mask = mask.at[ij[:, 0], ij[:, 1]].set(True)
    if pad_cells > 0:
        size = 2 * pad_cells + 1
        mask = jax.lax.reduce_window(
            mask, False, jax.lax.bitwise_or, (size, size), (1, 1), "SAME")
    return mask


def compute_hf_maxmin(terrain: Terrain, body_points: jax.Array,
                      mask: Optional[jax.Array] = None,
                      z_buf: float = 3.0, jump_buf: float = 0.8,
                      contact_eps: float = 0.05) -> Terrain:
    """Augmentation bounds (reference: util/terrain_util.py:2017-2047
    compute_hf_extra_vals):

    * free cells may move in [min(terrain) - z_buf, max(body z) + z_buf];
    * cells the motion touched are pinned near their current height;
    * **jump-gap carving**: touched cells the character cleared by at least
      ``jump_buf`` (min body height >= hf + jump_buf) may be carved *down*
      to a gap (hmin = global min - z_buf) and raised only up to
      ``min_body - jump_buf`` — augmentation can open a gap under a jump
      but never put terrain into the flight path.
    """
    pts = body_points.reshape(-1, 3)
    if mask is None:
        mask = compute_hf_mask_inds(terrain, pts)
    ij = get_grid_index(terrain, pts[:, 0:2])
    # min body height per cell (inf where never visited)
    min_body = jnp.full(terrain.dims, jnp.inf, terrain.hf.dtype)
    min_body = min_body.at[ij[:, 0], ij[:, 1]].min(pts[:, 2])
    # spread over the padded mask like compute_hf_mask_inds does
    min_body = -jax.lax.reduce_window(
        -min_body, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")

    max_free = jnp.max(pts[:, 2]) + z_buf
    min_free = jnp.min(terrain.hf) - z_buf
    hmax = jnp.where(mask, terrain.hf + contact_eps, max_free)
    hmin = jnp.where(mask, terrain.hf - contact_eps, min_free)
    jump = mask & ((min_body - terrain.hf) >= jump_buf)
    hmax = jnp.where(jump, min_body - jump_buf, hmax)
    hmin = jnp.where(jump, min_free, hmin)
    return terrain.replace(hf_mask=mask,
                           hf_maxmin=jnp.stack([hmax, hmin], axis=-1))


def merge_hfs(hf1: jax.Array, hf_mask: jax.Array, hf_maxmin: Optional[jax.Array],
              hf2: jax.Array) -> jax.Array:
    """Merge a motion-protected heightfield with a free-form edit: keep
    ``hf1`` where the motion mask is set, take ``hf2`` elsewhere, clamped
    into the motion-aware ``hf_maxmin`` bounds (reference:
    util/terrain_util.py:1349-1365 merge_hfs)."""
    merged = jnp.where(hf_mask, hf1, hf2)
    if hf_maxmin is not None:
        clamped = jnp.clip(merged, hf_maxmin[..., 1], hf_maxmin[..., 0])
        merged = jnp.where(hf_mask, merged, clamped)
    return merged


# ---------------------------------------------------------------------------
# Slicing / padding (host-friendly, shapes change)
# ---------------------------------------------------------------------------


def pad_terrain(terrain: Terrain, pad: int, height: float = 0.0) -> Terrain:
    hf = jnp.pad(terrain.hf, pad, constant_values=height)
    mask = jnp.pad(terrain.hf_mask, pad, constant_values=False)
    maxmin = jnp.pad(terrain.hf_maxmin, ((pad, pad), (pad, pad), (0, 0)),
                     constant_values=0.0)
    maxmin = maxmin.at[..., 0].set(
        jnp.where(jnp.pad(jnp.ones(terrain.dims, bool), pad), maxmin[..., 0],
                  height + 3.0))
    maxmin = maxmin.at[..., 1].set(
        jnp.where(jnp.pad(jnp.ones(terrain.dims, bool), pad), maxmin[..., 1],
                  height - 3.0))
    return Terrain(hf=hf, hf_mask=mask, hf_maxmin=maxmin,
                   min_point=terrain.min_point - pad * terrain.dxdy,
                   dxdy=terrain.dxdy)


def slice_terrain(terrain: Terrain, min_i: int, min_j: int,
                  max_i: int, max_j: int) -> Terrain:
    return Terrain(
        hf=terrain.hf[min_i:max_i, min_j:max_j],
        hf_mask=terrain.hf_mask[min_i:max_i, min_j:max_j],
        hf_maxmin=terrain.hf_maxmin[min_i:max_i, min_j:max_j],
        min_point=terrain.min_point
        + jnp.asarray([min_i, min_j], terrain.min_point.dtype) * terrain.dxdy,
        dxdy=terrain.dxdy,
    )


def slice_terrain_around_points(terrain: Terrain, points_xy: np.ndarray,
                                padding: float = 1.0,
                                localize: bool = True) -> Terrain:
    """Host-side: crop the terrain to the bounding box of xy points."""
    pts = np.asarray(points_xy).reshape(-1, 2)
    dxdy = np.asarray(terrain.dxdy)
    minp = np.asarray(terrain.min_point)
    dims = terrain.dims
    pad = np.ceil(padding / dxdy).astype(int)
    lo = np.floor((pts.min(0) - minp) / dxdy).astype(int) - pad
    hi = np.ceil((pts.max(0) - minp) / dxdy).astype(int) + pad + 1
    lo = np.clip(lo, 0, np.asarray(dims) - 1)
    hi = np.clip(hi, 1, np.asarray(dims))
    out = slice_terrain(terrain, int(lo[0]), int(lo[1]), int(hi[0]), int(hi[1]))
    if localize:
        out = out.replace(min_point=jnp.zeros_like(out.min_point))
    return out


# ---------------------------------------------------------------------------
# Procedural generation (host side, numpy RNG)
# ---------------------------------------------------------------------------


def add_boxes(rng: np.random.Generator, hf: np.ndarray, num_boxes: int = 32,
              box_min_height: float = -3.0, box_max_height: float = 3.0,
              box_min_len: int = 1, box_max_len: int = 6,
              hf_maxmin: Optional[np.ndarray] = None,
              min_angle: float = 0.0,
              max_angle: float = 2.0 * np.pi) -> np.ndarray:
    """Stamp random (optionally rotated) raised/lowered boxes onto the
    heightfield (reference: util/terrain_util.py:864-917 add_boxes_to_hf2 —
    boxes are rotated by a uniform angle about their center; pass
    ``max_angle=0`` for axis-aligned stamps).  ``hf_maxmin`` clamps the
    result into per-cell motion-protected bounds.  The result is always
    float32 (heightfields are device-bound f32 everywhere downstream),
    regardless of the input dtype."""
    h, w = hf.shape
    hf = hf.copy()
    gx, gy = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    for _ in range(num_boxes):
        c = rng.uniform(0.0, 1.0, size=2) * np.asarray([h, w], np.float32)
        blen = rng.uniform(box_min_len, box_max_len, size=2)
        ang = rng.uniform(min_angle, max_angle)
        height = np.float32(rng.uniform(box_min_height, box_max_height))
        rel_x, rel_y = gx - c[0], gy - c[1]
        ca, sa = np.cos(ang), np.sin(ang)
        rx = ca * rel_x - sa * rel_y
        ry = sa * rel_x + ca * rel_y
        in_box = (np.abs(rx) < blen[0] / 2) & (np.abs(ry) < blen[1] / 2)
        hf = np.where(in_box, height, hf)
    if hf_maxmin is not None:
        hf = np.clip(hf, hf_maxmin[..., 1], hf_maxmin[..., 0])
    return hf.astype(np.float32)


def add_boxes_at_points(rng: np.random.Generator, hf: np.ndarray,
                        centers_ij: np.ndarray,
                        min_h: float = 0.1, max_h: float = 0.6,
                        min_len: float = 2.0, max_len: float = 6.0,
                        min_angle: float = 0.0,
                        max_angle: float = np.pi) -> np.ndarray:
    """Stamp randomly-rotated boxes centered at given grid points
    (grid units).  Used by terrain augmentation to place obstacles along
    a motion's path (reference:
    util/terrain_util.py:930-969 add_boxes_to_hf_at_xy_points)."""
    hf = hf.copy()
    gx, gy = np.meshgrid(np.arange(hf.shape[0], dtype=np.float32),
                         np.arange(hf.shape[1], dtype=np.float32),
                         indexing="ij")
    xy = np.stack([gx, gy], axis=-1)
    for c in np.asarray(centers_ij, np.float32).reshape(-1, 2):
        blen = rng.uniform(min_len, max_len, size=2)
        ang = rng.uniform(min_angle, max_angle)
        rel = xy - c
        ca, sa = np.cos(ang), np.sin(ang)
        rx = ca * rel[..., 0] - sa * rel[..., 1]
        ry = sa * rel[..., 0] + ca * rel[..., 1]
        in_box = ((np.abs(rx) < blen[0] / 2) & (np.abs(ry) < blen[1] / 2))
        hf = np.where(in_box, np.float32(rng.uniform(min_h, max_h)), hf)
    return hf


def add_stairs(rng: np.random.Generator, hf: np.ndarray,
               min_start_height: float = -3.0, max_start_height: float = 1.0,
               min_step: float = 0.1, max_step: float = 0.4,
               min_width: int = 1, max_width: int = 3) -> np.ndarray:
    """Add a run of stairs along a random axis direction."""
    h, w = hf.shape
    hf = hf.copy()
    axis = rng.integers(0, 2)
    direction = rng.choice([-1, 1])
    height = rng.uniform(min_start_height, max_start_height)
    step = rng.uniform(min_step, max_step) * rng.choice([-1, 1])
    pos = 0
    n = h if axis == 0 else w
    while pos < n:
        width = int(rng.integers(min_width, max_width + 1))
        sl = slice(pos, min(pos + width, n))
        if axis == 0:
            hf[sl if direction == 1 else slice(n - sl.stop, n - sl.start), :] = height
        else:
            hf[:, sl if direction == 1 else slice(n - sl.stop, n - sl.start)] = height
        height += step
        pos += width
    return hf


def perlin(rng: np.random.Generator, shape: Tuple[int, int],
           res: Tuple[int, int] = (4, 4), octaves: int = 1,
           persistence: float = 0.5, amplitude: float = 1.0) -> np.ndarray:
    """Multi-octave 2D value-gradient (perlin) noise."""
    def fade(t):
        return 6 * t**5 - 15 * t**4 + 10 * t**3

    def one(res_):
        d0 = shape[0] // res_[0]
        d1 = shape[1] // res_[1]
        grid = np.mgrid[0:res_[0]:1, 0:res_[1]:1].transpose(1, 2, 0)
        angles = 2 * np.pi * rng.random((res_[0] + 1, res_[1] + 1))
        grads = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
        g = grads.repeat(d0, 0).repeat(d1, 1)[:shape[0] + d0, :shape[1] + d1]
        xy = np.mgrid[0:shape[0], 0:shape[1]].transpose(1, 2, 0).astype(float)
        xy[..., 0] = xy[..., 0] / d0 % 1
        xy[..., 1] = xy[..., 1] / d1 % 1

        def dot(grad, shift):
            return (np.stack([xy[..., 0] + shift[0], xy[..., 1] + shift[1]],
                             axis=-1) * grad[:shape[0], :shape[1]]).sum(-1)

        n00 = dot(g[:-d0, :-d1], (0, 0))
        n10 = dot(g[d0:, :-d1], (-1, 0))
        n01 = dot(g[:-d0, d1:], (0, -1))
        n11 = dot(g[d0:, d1:], (-1, -1))
        t = fade(xy)
        nx0 = n00 * (1 - t[..., 0]) + n10 * t[..., 0]
        nx1 = n01 * (1 - t[..., 0]) + n11 * t[..., 0]
        return np.sqrt(2) * ((1 - t[..., 1]) * nx0 + t[..., 1] * nx1)

    noise = np.zeros(shape)
    freq, amp = 1, 1.0
    for _ in range(octaves):
        r = (res[0] * freq, res[1] * freq)
        if shape[0] % r[0] or shape[1] % r[1]:
            break
        noise += amp * one(r)
        freq *= 2
        amp *= persistence
    return (amplitude * noise).astype(np.float32)


def gen_curvy_paths(rng: np.random.Generator, hf: np.ndarray,
                    num_paths: int = 10, floor_height: float = -1.0,
                    path_min_height: float = -0.5, path_max_height: float = 3.0,
                    curviness: float = 7.0, num_points: int = 180) -> np.ndarray:
    """Carve random-walk paths of varying heights into a low floor."""
    h, w = hf.shape
    out = np.full_like(hf, floor_height)
    for _ in range(num_paths):
        pos = np.array([rng.uniform(0, h), rng.uniform(0, w)])
        ang = rng.uniform(0, 2 * np.pi)
        height = rng.uniform(path_min_height, path_max_height)
        for _ in range(num_points):
            i, j = int(pos[0]), int(pos[1])
            if 0 <= i < h and 0 <= j < w:
                out[max(0, i - 1):i + 2, max(0, j - 1):j + 2] = height
            ang += rng.normal() * curviness * np.pi / 180.0
            pos += np.array([np.cos(ang), np.sin(ang)])
            if not (0 <= pos[0] < h and 0 <= pos[1] < w):
                break
    return out


def hf_to_voxelized_trimesh(hf: np.ndarray, min_x: float, min_y: float,
                            dx: float, use_native: bool = True):
    """Minecraft-style mesh export (verts, faces) of a heightfield.

    Dispatches to the native C++ mesher (parc_tpu/native/mesher.cpp) when
    available (emits only the non-coplanar side quads plus a border skirt);
    otherwise uses the vectorized numpy fallback below (the reference
    builds this with a Python double loop; on TPU it is only needed for
    visualization/export, never for collision).
    """
    if use_native:
        from parc_tpu import native
        if native.available():
            return native.hf_to_trimesh(np.asarray(hf, np.float32),
                                        float(min_x), float(min_y),
                                        float(dx), float(dx))
    h, w = hf.shape
    half = dx / 2.0
    xs = min_x + np.arange(h) * dx
    ys = min_y + np.arange(w) * dx
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    # 4 top corners per cell
    cx = np.stack([gx - half, gx + half, gx + half, gx - half], -1)
    cy = np.stack([gy - half, gy - half, gy + half, gy + half], -1)
    cz = np.repeat(hf[..., None], 4, axis=-1)
    verts = np.stack([cx, cy, cz], -1).reshape(-1, 3)
    base = 4 * np.arange(h * w).reshape(h, w)
    top1 = np.stack([base, base + 1, base + 2], -1).reshape(-1, 3)
    top2 = np.stack([base, base + 2, base + 3], -1).reshape(-1, 3)
    faces = [top1, top2]
    # vertical side quads between x-neighbors
    b0, b1 = base[:-1, :], base[1:, :]
    # cell i side (+x) uses corners 1,2 ; cell i+1 side (-x) corners 0,3
    faces.append(np.stack([b0 + 1, b1, b0 + 2], -1).reshape(-1, 3))
    faces.append(np.stack([b0 + 2, b1, b1 + 3], -1).reshape(-1, 3))
    c0, c1 = base[:, :-1], base[:, 1:]
    faces.append(np.stack([c0 + 2, c1, c0 + 3], -1).reshape(-1, 3))
    faces.append(np.stack([c0 + 3, c1, c1 + 1], -1).reshape(-1, 3))
    return verts, np.concatenate(faces, 0)


def linear_parkour_course(rng: np.random.Generator, x_dim: int = 48,
                          y_dim: int = 16, dx: float = 0.4,
                          num_blocks: int = 6,
                          height_range: Tuple[float, float] = (-1.0, 1.5),
                          width_range: Tuple[int, int] = (2, 6)) -> Terrain:
    """Linear parkour course: a runway along x with raised/lowered blocks at
    random stations (reference: util/terrain_util.py:320-543
    linear/random_linear_parkour_course — hf-based; the reference also
    emits a trimesh, which on TPU comes from hf_to_voxelized_trimesh)."""
    hf = np.zeros((x_dim, y_dim), np.float32)
    stations = np.sort(rng.choice(
        np.arange(4, x_dim - 4), size=num_blocks, replace=False))
    for cx in stations:
        h = rng.uniform(*height_range)
        wx = rng.integers(*width_range)
        wy = rng.integers(y_dim // 3, y_dim)
        y0 = rng.integers(0, max(y_dim - wy, 1))
        hf[cx:cx + wx, y0:y0 + wy] = h
    half_x, half_y = x_dim * dx / 2, y_dim * dx / 2
    t = create_terrain(x_dim, y_dim, dx=dx, min_x=-half_x, min_y=-half_y)
    return t.replace(hf=jnp.asarray(hf))


def random_linear_parkour_course(rng: np.random.Generator,
                                 x_dim: int = 64, y_dim: int = 16,
                                 dx: float = 0.4,
                                 min_block_spacing: float = 6.5,
                                 max_block_spacing: float = 8.0,
                                 gap_width: float = 1.2,
                                 gap_height: float = -1.5,
                                 vault_width: float = 0.8,
                                 vault_height: float = 1.0,
                                 num_padding_cells: int = 2) -> Terrain:
    """Randomized linear parkour course (reference:
    util/terrain_util.py:427-543 random_linear_parkour_course):
    stations along the course axis spaced alternately by the min/max block
    spacing (coin flip per station), each a full-width **vault** (raised
    block to climb over) or **gap** (pit to jump across).  The reference
    also emits a bespoke trimesh for PhysX; on TPU the hf itself is the
    collision geometry (hf_to_voxelized_trimesh only for export)."""
    hf = np.zeros((x_dim, y_dim), np.float32)
    x = 0.0
    max_x_len = x_dim * dx
    centers = []
    while True:
        x += min_block_spacing if rng.random() < 0.5 else max_block_spacing
        if x >= max_x_len:
            break
        centers.append(int(round(x / dx)) + num_padding_cells)
    for c in centers:
        if c >= x_dim - num_padding_cells:
            continue
        is_vault = rng.random() < 0.5
        h = vault_height if is_vault else gap_height
        w = vault_width if is_vault else gap_width
        wc = max(int(round(w / dx)) // 2, 1)
        lo, hi = max(c - wc, 0), min(c + wc + 1, x_dim)
        hf[lo:hi, :] = h
    half_x, half_y = x_dim * dx / 2, y_dim * dx / 2
    t = create_terrain(x_dim, y_dim, dx=dx, min_x=-half_x, min_y=-half_y)
    return t.replace(hf=jnp.asarray(hf))


def hf_from_motion(body_pos: np.ndarray, dx: float = 0.4,
                   num_neg_x: int = 15, num_pos_x: int = 15,
                   num_neg_y: int = 15, num_pos_y: int = 15,
                   min_height: float = -2.0,
                   ground_height: float = 0.0,
                   floor_heights: Optional[np.ndarray] = None,
                   canon_idx: int = 0) -> Terrain:
    """Path-under-the-motion heightfield (reference:
    util/terrain_util.py:597-700 hf_from_motion): a low floor at
    ``min_height`` with a walkable path at ``ground_height`` (or the
    per-frame ``floor_heights``) carved under every body position.  Used
    to synthesize per-motion terrains for clips that have none.

    ``body_pos`` is (T, B, 3) world body positions (FK output); the grid
    is centered on the root/body position of frame ``canon_idx``.
    Returns a Terrain with ``hf_mask`` marking the path cells.
    """
    body_pos = np.asarray(body_pos)
    center = body_pos[canon_idx, 0, 0:2]
    min_point = center - dx * np.asarray([num_neg_x, num_neg_y])
    dims = (num_neg_x + num_pos_x + 1, num_neg_y + num_pos_y + 1)
    hf = np.full(dims, min_height, np.float32)
    mask = np.zeros(dims, bool)
    ij = np.round((body_pos[..., 0:2] - min_point) / dx).astype(np.int64)
    ij = np.clip(ij, 0, np.asarray(dims) - 1)       # (T, B, 2)
    if floor_heights is not None:
        # per-frame floor height, written per body column (T-major so the
        # path under later frames wins like the reference's CPU scatter)
        fh = np.broadcast_to(np.asarray(floor_heights, np.float32)[:, None],
                             ij.shape[:2])
        hf[ij[..., 0].ravel(), ij[..., 1].ravel()] = fh.ravel()
    else:
        hf[ij[..., 0].ravel(), ij[..., 1].ravel()] = ground_height
    mask[ij[..., 0].ravel(), ij[..., 1].ravel()] = True
    t = create_terrain(dims[0], dims[1], dx=dx,
                       min_x=float(min_point[0]), min_y=float(min_point[1]))
    return t.replace(hf=jnp.asarray(hf), hf_mask=jnp.asarray(mask))


def hf_from_motion_discrete_heights(terrain: Terrain,
                                    body_pos: np.ndarray,
                                    heights) -> Terrain:
    """Snap motion-touched cells to discrete height levels (reference:
    util/terrain_util.py:697-737 hf_from_motion_discrete_heights, driven
    by the MOTION_FORGE terrain GUI, terrain_gui.py:182).

    ``heights`` is an ascending list of allowed levels.  Per cell, the
    minimum body z that passed over it (min-pooled 7x7 like the
    reference) picks the first level above ``min_z - 0.5``; cells the
    motion never touched (``hf_mask`` False) drop to ``heights[0]``.

    ``body_pos`` is (T, B, 3) world body positions (FK output).
    """
    heights = np.asarray(heights, np.float32)
    if heights.ndim != 1 or heights.size == 0 or np.any(np.diff(heights) < 0):
        raise ValueError("heights must be a non-empty ascending sequence")
    dims = terrain.dims
    mn = np.asarray(terrain.min_point)
    dxdy = np.asarray(terrain.dxdy)
    pts = np.asarray(body_pos).reshape(-1, 3)
    ij = np.round((pts[:, 0:2] - mn) / dxdy).astype(np.int64)
    ij = np.clip(ij, 0, np.asarray(dims) - 1)
    min_h = np.full(dims, heights[-1], np.float32)
    np.minimum.at(min_h, (ij[:, 0], ij[:, 1]), pts[:, 2].astype(np.float32))
    min_h = np.asarray(minpool_hf(jnp.asarray(min_h), None, 7))
    # first (lowest) level strictly above min_z - 0.5; none -> heights[0]
    k = np.searchsorted(heights, min_h - 0.5, side="right")
    snapped = heights[np.where(k < heights.size, k, 0)]
    mask = np.asarray(terrain.hf_mask)
    hf = np.where(mask, snapped, heights[0]).astype(np.float32)
    return terrain.replace(hf=jnp.asarray(hf))


def generate_cave(rng: np.random.Generator, x_dim: int = 48,
                  y_dim: int = 48, dx: float = 0.4,
                  num_iterations: int = 5, fill_p: float = 0.5,
                  birth_threshold: int = 6, death_threshold: int = 4,
                  wall_height: float = 3.0) -> Terrain:
    """Cellular-automata cave terrain (reference:
    util/terrain_util.py:2137-2166): random fill then birth/death smoothing;
    alive cells become walls."""
    alive = rng.random((x_dim, y_dim)) < fill_p
    for _ in range(num_iterations):
        padded = np.pad(alive.astype(np.int32), 1)
        count = sum(padded[1 + di:x_dim + 1 + di, 1 + dj:y_dim + 1 + dj]
                    for di in (-1, 0, 1) for dj in (-1, 0, 1))
        birth = (count >= birth_threshold) & ~alive
        death = (count <= death_threshold) & alive
        alive = (alive | birth) & ~death
    hf = alive.astype(np.float32) * wall_height
    half_x, half_y = x_dim * dx / 2, y_dim * dx / 2
    t = create_terrain(x_dim, y_dim, dx=dx, min_x=-half_x, min_y=-half_y)
    return t.replace(hf=jnp.asarray(hf))
