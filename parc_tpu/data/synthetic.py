"""Synthetic motion clips for tests, benchmarks, and dry runs."""

from __future__ import annotations

import numpy as np

from parc_tpu.anim import motion_data as md


def standing_clip(n: int = 90, fps: float = 30.0,
                  terrain_dim: int = 24) -> md.MotionData:
    """A clip that stands still at the default pose on flat terrain."""
    frames = np.zeros((n, 34), np.float32)
    frames[:, 2] = 0.94
    contacts = np.zeros((n, 15), np.float32)
    contacts[:, [11, 14]] = 1.0  # feet
    half = terrain_dim * 0.4 / 2.0
    terrain = md.HostTerrain(
        hf=np.zeros((terrain_dim, terrain_dim), np.float32),
        min_point=np.asarray([-half, -half]), dxdy=np.asarray([0.4, 0.4]))
    return md.MotionData(frames=frames, fps=fps, contacts=contacts,
                         terrain=terrain)


def walking_clip(n: int = 90, fps: float = 30.0, speed: float = 1.4,
                 seed: int = 0, terrain_dim: int = 32) -> md.MotionData:
    """A forward-walking clip with simple sinusoidal leg motion."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fps
    frames = np.zeros((n, 34), np.float32)
    frames[:, 0] = speed * t
    frames[:, 2] = 0.92 + 0.02 * np.sin(2 * np.pi * 1.8 * t)
    phase = 2 * np.pi * 0.9 * t
    # hips (y-axis swings) and knees
    frames[:, 6 + 13] = 0.45 * np.sin(phase)            # right hip y
    frames[:, 6 + 22] = -0.45 * np.sin(phase)           # left hip y
    frames[:, 6 + 16] = 0.5 * np.maximum(np.sin(phase + np.pi), 0)  # r knee
    frames[:, 6 + 25] = 0.5 * np.maximum(np.sin(phase), 0)          # l knee
    # small arm counterswing
    frames[:, 6 + 7] = 0.2 * np.sin(phase + np.pi)
    frames[:, 6 + 10] = 0.2 * np.sin(phase)
    contacts = np.zeros((n, 15), np.float32)
    contacts[:, 11] = (np.sin(phase) < 0).astype(np.float32)
    contacts[:, 14] = (np.sin(phase) >= 0).astype(np.float32)
    half = terrain_dim * 0.4 / 2.0
    terrain = md.HostTerrain(
        hf=np.zeros((terrain_dim, terrain_dim), np.float32),
        min_point=np.asarray([-half, -half]), dxdy=np.asarray([0.4, 0.4]))
    return md.MotionData(frames=frames, fps=fps, contacts=contacts,
                         terrain=terrain)
