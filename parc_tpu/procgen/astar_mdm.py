"""Online A* + MDM replanning ("astar_mdm" demo).

From the character's *current* pose: slice the terrain between the
character and a target, A*-plan a route, generate a kinematic motion
along it with the MDM, and package the best rollout as a fresh
single-clip MotionLib the tracking env can swap in — the interactive
"plan a new parkour route from where I am" loop.

Reference parity: envs/ig_parkour/dm_env.py:915-1030 (astar_mdm) — the
terrain slice + A* + mdm_path generation + MotionLib swap + clip save.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml
from parc_tpu.diffusion.mdm import MDM, MDMState
from parc_tpu.procgen import astar, mdm_path
from parc_tpu.utils import terrain as terrain_lib


@dataclasses.dataclass
class AStarMDMSettings:
    slice_pad: int = 10                  # cells around the start/end bbox
    astar: astar.AStarSettings = dataclasses.field(
        default_factory=astar.AStarSettings)
    path: mdm_path.PathGenSettings = dataclasses.field(
        default_factory=lambda: mdm_path.PathGenSettings(
            batch_size=4, max_seconds=20.0))
    save_path: Optional[str] = None      # optional clip dump (.npz)


def astar_mdm_replan(mdm: MDM, state: MDMState,
                     terrain: md.HostTerrain,
                     prev_frames34: np.ndarray,
                     prev_contacts: np.ndarray,
                     target_xy: np.ndarray,
                     rng: jax.Array,
                     cfg: AStarMDMSettings = AStarMDMSettings()
                     ) -> Optional[Tuple[md.MotionData, ml.MotionLib]]:
    """Plan + generate a new reference motion from the current pose.

    Args:
      terrain: the env's (host) terrain.
      prev_frames34: (num_prev, 34) most recent character frames (the
        reference feeds the last 2 recorded frames of env 0).
      prev_contacts: (num_prev, num_bodies).
      target_xy: (2,) world target.
    Returns:
      (clip, single-motion MotionLib) of the best rollout, or None when
      no A* path exists.
    """
    model = mdm.model
    hf = np.asarray(terrain.hf)
    minp = np.asarray(terrain.min_point[:2], np.float32)
    dxdy = np.asarray(terrain.dxdy[:2], np.float32)

    start_xy = np.asarray(prev_frames34[-1, 0:2], np.float32)
    start_ij = np.clip(np.round((start_xy - minp) / dxdy).astype(int),
                       0, np.asarray(hf.shape) - 1)
    end_ij = np.clip(np.round((np.asarray(target_xy) - minp)
                              / dxdy).astype(int),
                     0, np.asarray(hf.shape) - 1)

    # slice the terrain to the padded start/end bounding box
    lo = np.maximum(np.minimum(start_ij, end_ij) - cfg.slice_pad, 0)
    hi = np.minimum(np.maximum(start_ij, end_ij) + cfg.slice_pad + 1,
                    np.asarray(hf.shape))
    hf_slice = hf[lo[0]:hi[0], lo[1]:hi[1]]
    slice_min = minp + lo * dxdy
    s = tuple(start_ij - lo)
    e = tuple(end_ij - lo)

    path = astar.run_a_star(hf_slice, dxdy, s, e, cfg.astar)
    if path is None:
        return None
    nodes = astar.path_to_world(path, slice_min, dxdy, hf_slice)

    dev_terrain = terrain_lib.Terrain(
        hf=jax.numpy.asarray(hf_slice),
        hf_mask=jax.numpy.zeros(hf_slice.shape, bool),
        hf_maxmin=jax.numpy.stack([jax.numpy.asarray(hf_slice) + 3.0,
                                   jax.numpy.asarray(hf_slice) - 3.0], -1),
        min_point=jax.numpy.asarray(slice_min),
        dxdy=jax.numpy.asarray(dxdy))

    result = mdm_path.generate_frames_along_path(
        mdm, state, dev_terrain, nodes,
        np.asarray(prev_frames34, np.float32),
        np.asarray(prev_contacts, np.float32), rng, cfg.path)

    best = int(np.argmin(result.total_loss))
    t = int(result.lengths[best])
    clip = md.MotionData(
        frames=np.asarray(result.frames34[best, :t], np.float32),
        fps=cfg.path.fps, loop_mode=md.CLAMP,
        contacts=np.asarray(result.contacts[best, :t], np.float32),
        terrain=md.HostTerrain(hf=hf_slice.astype(np.float32),
                               min_point=slice_min.astype(np.float32),
                               dxdy=dxdy))
    if cfg.save_path:
        md.save_motion_data(cfg.save_path, clip)
    lib = ml.build_motion_lib(model, [clip])
    return clip, lib
