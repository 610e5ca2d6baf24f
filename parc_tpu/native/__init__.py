"""Native (C++) host-side runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA; these are the *host* hot loops that the
reference left in slow Python: the A* planner (one search per generated
motion in kin-gen — tools/procgen/astar.py:327) and the heightfield →
voxelized-trimesh builder (util/terrain_util.py:1099-1251, timed as a
startup bottleneck at envs/ig_env.py:503-504).

The shared library is built on demand with g++ (no pybind11 in the image;
plain C ABI + ctypes). Falls back silently to the pure-Python
implementations if no compiler is available — ``available()`` reports
which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "libparc_native.so")
_SOURCES = ["astar.cpp", "mesher.cpp"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


class _AStarSettingsC(ctypes.Structure):
    _fields_ = [
        ("max_z_diff", ctypes.c_float),
        ("max_jump_dist", ctypes.c_float),
        ("min_jump_gap", ctypes.c_float),
        ("z_weight", ctypes.c_float),
        ("bumpiness_weight", ctypes.c_float),
        ("rand_cost_scale", ctypes.c_float),
        ("jump_cost_mult", ctypes.c_float),
    ]


def _build() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if (os.path.exists(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= newest_src):
        return True
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO_PATH] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.parc_astar.restype = ctypes.c_int32
        lib.parc_astar.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(_AStarSettingsC),
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32)]
        lib.parc_hf_mesh.restype = ctypes.c_int32
        lib.parc_hf_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def available() -> bool:
    """True if the native library built and loaded."""
    return _load() is not None


def astar(hf: np.ndarray, dxdy, start, goal, settings,
          seed: int = 0) -> Optional[np.ndarray]:
    """Native A* (same contract as parc_tpu.procgen.astar.run_a_star):
    returns (N, 3) int32 [i, j, jump_flag] path or None if unreachable.

    Raises RuntimeError if the native library is unavailable — callers
    should check ``available()`` or use procgen.astar.run_a_star, which
    dispatches automatically.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    hf = np.ascontiguousarray(hf, np.float32)
    h, w = hf.shape
    s = _AStarSettingsC(
        max_z_diff=settings.max_z_diff, max_jump_dist=settings.max_jump_dist,
        min_jump_gap=settings.min_jump_gap, z_weight=settings.z_weight,
        bumpiness_weight=settings.bumpiness_weight,
        rand_cost_scale=settings.rand_cost_scale,
        jump_cost_mult=settings.jump_cost_mult)
    out = np.empty((h * w, 3), np.int32)
    n = lib.parc_astar(
        hf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        float(dxdy[0]), float(dxdy[1]), int(start[0]), int(start[1]),
        int(goal[0]), int(goal[1]), ctypes.byref(s), int(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if n < 0:
        raise ValueError("bad A* arguments")
    if n == 0:
        return None
    return out[:n].copy()


def hf_to_trimesh(hf: np.ndarray, min_x: float, min_y: float, dx: float,
                  dy: float, skirt_depth: float = 10.0
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Native heightfield -> voxelized trimesh.

    Returns (verts (V, 3) float32, tris (T, 3) int32).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    hf = np.ascontiguousarray(hf, np.float32)
    h, w = hf.shape
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    hf_p = hf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.parc_hf_mesh(hf_p, h, w, min_x, min_y, dx, dy, skirt_depth,
                          None, None, ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise ValueError("bad mesher arguments")
    verts = np.empty((nv.value, 3), np.float32)
    tris = np.empty((nt.value, 3), np.int32)
    rc = lib.parc_hf_mesh(
        hf_p, h, w, min_x, min_y, dx, dy, skirt_depth,
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise ValueError("bad mesher arguments")
    return verts, tris
