"""Terrain-perception point patterns: golden parity vs the reference's
geom_util generators + env wiring of the three perception modes
(reference envs/ig_parkour/terrain_perception/perception_builder.py)."""

import dataclasses
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.envs import perception
from parc_tpu.envs.base import EnvConfig


@pytest.fixture(scope="module")
def ref_gu(reference_root):
    torch = pytest.importorskip("torch")
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from util import geom_util as gu
    return torch, gu


def test_cone_pattern_golden(ref_gu):
    """cone_pattern == reference get_xy_points_cone (geom_util.py:249-271),
    same ray-major point order."""
    torch, gu = ref_gu
    ref = gu.get_xy_points_cone(
        center=torch.zeros(2), dx=0.05, num_neg=2, num_pos=10,
        num_rays_neg=3, num_rays_pos=3,
        angle_between_rays=0.26179938779).numpy()
    ours = perception.cone_pattern(num_behind=2, num_ahead=10, num_left=3,
                                   num_right=3, dx=0.05,
                                   angle=0.26179938779)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grid_pattern_golden(ref_gu):
    """grid_pattern == reference get_xy_grid_points (geom_util.py:210-222)."""
    torch, gu = ref_gu
    ref = gu.get_xy_grid_points(
        center=torch.tensor([0.3, -0.2]), dx=0.1, dy=0.15,
        num_x_neg=4, num_x_pos=7, num_y_neg=5, num_y_pos=6)
    ref = ref.reshape(-1, 2).numpy()
    ours = perception.grid_pattern(dx=0.1, dy=0.15, num_x_neg=4,
                                   num_x_pos=7, num_y_neg=5, num_y_pos=6,
                                   center=(0.3, -0.2))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_coarse2fine_pattern_golden(ref_gu):
    """coarse2fine_pattern == reference get_xy_grid_points_coarse2fine
    (geom_util.py:224-247), including its outward-x / inward-y spread."""
    torch, gu = ref_gu
    ref = gu.get_xy_grid_points_coarse2fine(
        center=torch.zeros(2), dx=0.1, dy=0.12, num_x=6, num_y=5,
        root_x_offset=0.5, dx_incr_rate=0.03, dy_incr_rate=0.02)
    ref = ref.reshape(-1, 2).numpy()
    ours = perception.coarse2fine_pattern(dx=0.1, dy=0.12, num_x=6,
                                          num_y=5, root_x_offset=0.5,
                                          dx_incr_rate=0.03,
                                          dy_incr_rate=0.02)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_points_rotation():
    """sample_points rotates the local pattern by the root heading and
    translates to the root xy."""
    from parc_tpu.utils import rotation as rot
    pattern = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    # 90-degree heading about z
    q = np.asarray(rot.axis_angle_to_quat(
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(np.pi / 2)))
    root_pos = jnp.asarray([2.0, 3.0, 0.7])
    pts = np.asarray(perception.sample_points(root_pos, jnp.asarray(q),
                                              pattern))
    np.testing.assert_allclose(pts, [[2.0, 4.0], [1.0, 3.0]], atol=1e-5)


@pytest.mark.parametrize("mode", perception.MODES)
def test_env_obs_dim_tracks_mode(mode):
    """DeepMimicEnv's hf_obs segment sizes from the configured perception."""
    from parc_tpu.envs import obs as obs_mod
    cfg = dataclasses.replace(EnvConfig(num_envs=2), terrain_obs_mode=mode)
    n = perception.num_points(cfg)
    assert obs_mod.num_ray_points(cfg) == n
    r, c = perception.hf_shape(cfg)
    assert r * c == n
    pts = perception.sample_points(
        jnp.zeros((2, 3)), jnp.asarray([[0.0, 0, 0, 1.0]] * 2),
        perception.local_pattern(cfg))
    assert pts.shape == (2, n, 2)
