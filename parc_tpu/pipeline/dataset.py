"""Dataset pipeline: class-balanced dataset YAML + library loading.

Builds a dataset manifest from folders of motion clips with class-balanced
duration-proportional sampling weights, filters oversized terrains and
high-loss clips, and precomputes terrain masks for clips missing them.

Reference parity: PARC/util/create_dataset.py:40-202 +
parc_5_create_dataset.py.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml


@dataclasses.dataclass
class DatasetConfig:
    max_terrain_cells: int = 45        # reference caps terrain at 45x45
    min_motion_weight: float = 0.01
    max_contact_loss: float = 3.0
    max_pen_loss: float = 8.0
    max_total_loss: float = 30.0


def scan_motion_files(root_dir: str) -> Dict[str, List[str]]:
    """Map class-name (subfolder) -> clip files (.npz/.pkl)."""
    classes: Dict[str, List[str]] = {}
    for sub in sorted(os.listdir(root_dir)):
        full = os.path.join(root_dir, sub)
        if os.path.isdir(full):
            files = sorted(glob.glob(os.path.join(full, "*.npz"))
                           + glob.glob(os.path.join(full, "*.pkl")))
            if files:
                classes[sub] = files
    if not classes:  # flat folder = one class
        files = sorted(glob.glob(os.path.join(root_dir, "*.npz"))
                       + glob.glob(os.path.join(root_dir, "*.pkl")))
        if files:
            classes["default"] = files
    return classes


def create_dataset_yaml(root_dir: str, out_path: str,
                        cfg: DatasetConfig = DatasetConfig()) -> str:
    """Write a motions.yaml with class-balanced sampling weights.

    Per class, clip weight is proportional to duration and normalized so
    every class sums to 1/num_classes; undersized weights are floored at
    min_motion_weight (reference: PARC/util/create_dataset.py:118-137).
    """
    classes = scan_motion_files(root_dir)
    entries = []
    num_classes = max(len(classes), 1)
    for cls, files in classes.items():
        durations, kept = [], []
        for f in files:
            try:
                clip = md.load_motion_data(f)
            except Exception as e:  # unreadable clip: skip
                print(f"skipping {f}: {e}")
                continue
            if clip.terrain is not None:
                h, w = clip.terrain.hf.shape
                if max(h, w) > cfg.max_terrain_cells:
                    continue
            # drop high-loss generated clips (reference:
            # PARC/util/create_dataset.py:118-137 filters on clip 'loss')
            if clip.losses is not None:
                if (clip.losses.get("contact", 0.0) > cfg.max_contact_loss
                        or clip.losses.get("pen", 0.0) > cfg.max_pen_loss
                        or clip.losses.get("total", 0.0)
                        > cfg.max_total_loss):
                    continue
            durations.append(clip.length)
            kept.append(f)
        total = sum(durations) or 1.0
        for f, dur in zip(kept, durations):
            w = max(dur / total / num_classes, cfg.min_motion_weight
                    / max(len(kept), 1))
            entries.append({"file": os.path.abspath(f),
                            "weight": float(w), "class": cls})
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        yaml.safe_dump({"motions": entries}, f)
    return out_path


def load_dataset(model: cm.CharModel, yaml_path: str) -> ml.MotionLib:
    """Load a dataset manifest into a device MotionLib."""
    with open(yaml_path) as f:
        manifest = yaml.safe_load(f)
    clips, weights = [], []
    for entry in manifest["motions"]:
        clips.append(md.load_motion_data(entry["file"]))
        weights.append(float(entry.get("weight", 1.0)))
    return ml.build_motion_lib(model, clips, weights)


def ensure_terrains(model: cm.CharModel,
                    clips: Sequence[md.MotionData]) -> None:
    """Give terrain-less clips a flat terrain fitted to the motion."""
    from parc_tpu.anim import motion_edit
    for clip in clips:
        if clip.terrain is None:
            clip.terrain = motion_edit.terrain_from_motion(
                model, clip.frames)
