"""Env construction from config dicts/YAML (reference:
envs/env_builder.py:6-25 — loads the env YAML and instantiates the
registered env class).

Registered envs: "deepmimic" (dataset tracking), "parkour" (dm + mgdm
composition), "mgdm" (standalone generated-reference env).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np

from parc_tpu.anim import char_model as cm
from parc_tpu.envs.base import EnvConfig
from parc_tpu.physics import engine


def _from_dict(cls, d: Dict[str, Any]):
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in fields})


def build_env(model: cm.CharModel, cfg: Dict[str, Any],
              mdm=None, mgdm_terrain=None):
    """Instantiate an env from a config dict (YAML-loaded).

    cfg["env_name"] selects the class (default "deepmimic"); remaining keys
    fill EnvConfig / SimParams / ParkourConfig fields by name.
    """
    name = cfg.get("env_name", "deepmimic")
    env_cfg = _from_dict(EnvConfig, cfg)
    sim_params = _from_dict(engine.SimParams, cfg.get("sim", cfg))
    if name == "deepmimic":
        from parc_tpu.envs.deepmimic import DeepMimicEnv
        return DeepMimicEnv(model, sim_params, env_cfg)
    if name == "parkour":
        from parc_tpu.envs.mgdm import make_platform_terrain
        from parc_tpu.envs.parkour import ParkourConfig, ParkourEnv
        assert mdm is not None, "parkour env needs an MDM"
        pcfg = _from_dict(ParkourConfig, cfg)
        terrain = mgdm_terrain
        if terrain is None:
            terrain = make_platform_terrain(
                np.random.default_rng(cfg.get("terrain_seed", 0)),
                dim=cfg.get("terrain_dim", 64))
        return ParkourEnv(model, sim_params, env_cfg, pcfg, mdm, terrain)
    if name == "mgdm":
        from parc_tpu.envs.mgdm import MGDMConfig, MGDMEnv, \
            make_platform_terrain
        assert mdm is not None, "mgdm env needs an MDM"
        mcfg = _from_dict(MGDMConfig, cfg)
        terrain = mgdm_terrain
        if terrain is None:
            terrain = make_platform_terrain(
                np.random.default_rng(cfg.get("terrain_seed", 0)),
                dim=cfg.get("terrain_dim", 64))
        return MGDMEnv(model, sim_params, env_cfg, mcfg, mdm, terrain)
    raise KeyError(f"unknown env_name {name!r}")
