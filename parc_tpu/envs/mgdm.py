"""MGDM env: MDM-in-the-loop reference generation for tracker training.

Instead of replaying dataset clips, the reference motions are periodically
*generated* by the motion diffusion model on a procedurally generated
terrain: every ``plan_frames`` control steps all envs synchronously replan
— one batched MDM call produces the next reference window for every env,
conditioned on the current reference state and a random xy target.

Reference parity: envs/ig_parkour/mgdm_env.py:37-862 (synchronized replan
:575-826, procgen platform terrain :206-350, OOB termination :159-204,
random targets :430-474).

Implementation note: :class:`MGDMEnv` is a thin alias of
:class:`~parc_tpu.envs.parkour.ParkourEnv` with ``mgdm_num = num_envs`` —
the replan / standing-window spawn / target-sampling / OOB logic exists
exactly once, in ParkourEnv (the reference duplicates it between dm_env
and mgdm_env).  The generated references live in the fixed-shape window
buffer inside ParkourState; replans run inside the jitted step under a
``lax.cond`` (the reference swaps whole MotionLibs on host instead,
mgdm_env.py:769-773).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_lib as ml
from parc_tpu.diffusion.mdm import MDM, MDMState
from parc_tpu.envs.base import EnvConfig
from parc_tpu.envs.parkour import ParkourConfig, ParkourEnv, ParkourLib
from parc_tpu.physics import engine
from parc_tpu.utils import terrain as terrain_lib


@dataclasses.dataclass(frozen=True)
class MGDMConfig:
    """Standalone-mgdm knobs (mapped onto ParkourConfig)."""

    plan_frames: int = 15            # frames per MDM window
    fps: float = 30.0
    target_radius: float = 3.0       # random target sampling radius
    min_target_dist: float = 1.0
    oob_z_low: float = -3.0          # out-of-bounds termination
    oob_z_high: float = 6.0
    ddim_stride: int = 20
    guidance_scale: float = 1.0
    spawn_margin_cells: int = 4


def make_platform_terrain(rng: np.random.Generator, dim: int = 64,
                          dx: float = 0.4) -> terrain_lib.Terrain:
    """Global procgen platform terrain (reference: mgdm_env.py:206-350)."""
    hf = np.zeros((dim, dim), np.float32)
    hf = terrain_lib.add_boxes(rng, hf, num_boxes=24, box_min_height=-0.5,
                               box_max_height=1.2, box_min_len=3,
                               box_max_len=10)
    half = dim * dx / 2
    t = terrain_lib.create_terrain(dim, dim, dx=dx, min_x=-half, min_y=-half)
    return t.replace(hf=jnp.asarray(hf))


class MGDMEnv(ParkourEnv):
    """Generated-reference tracking env = ParkourEnv with every env in the
    mgdm fraction.  Same EnvState API as every other env; pass a
    :class:`ParkourLib` bundle (see :meth:`make_default_lib`) as ``lib``.
    """

    def __init__(self, model: cm.CharModel, sim_params: engine.SimParams,
                 env_cfg: EnvConfig, mgdm_cfg: MGDMConfig, mdm: MDM,
                 terrain: terrain_lib.Terrain):
        pcfg = ParkourConfig(
            mgdm_num=env_cfg.num_envs,
            plan_frames=mgdm_cfg.plan_frames,
            target_radius=mgdm_cfg.target_radius,
            min_target_dist=mgdm_cfg.min_target_dist,
            ddim_stride=mgdm_cfg.ddim_stride,
            guidance_scale=mgdm_cfg.guidance_scale,
            spawn_margin_cells=mgdm_cfg.spawn_margin_cells,
            oob_z_low=mgdm_cfg.oob_z_low,
            oob_z_high=mgdm_cfg.oob_z_high)
        super().__init__(model, sim_params, env_cfg, pcfg, mdm, terrain)
        self.mcfg = mgdm_cfg

    def make_default_lib(self, mdm_state: MDMState,
                         lib: Optional[ml.MotionLib] = None) -> ParkourLib:
        """Bundle for a standalone mgdm run: mgdm uses no dataset motions,
        so the MotionLib only exists to carry the terrain slot and
        fail-rate machinery (a single zero-length standing clip)."""
        if lib is None:
            from parc_tpu.data.synthetic import standing_clip
            lib = ml.build_motion_lib(self.model, [standing_clip()])
        return self.make_lib(lib, mdm_state)
