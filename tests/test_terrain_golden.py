"""Golden terrain-kernel parity vs the reference's own terrain_util.

Imports /root/reference/util/terrain_util.py (pure torch once trimesh is
stubbed) and pins our JAX kernels against it — the same pattern as the
rotation / char-model golden tests (tests/test_rotation.py:93).
"""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.utils import terrain as terrain_lib


@pytest.fixture(scope="module")
def ref_tu(reference_root):
    torch = pytest.importorskip("torch")
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from util import terrain_util as tu
    return torch, tu


def _rand_hf(rng, h=12, w=10, lo=-0.5, hi=1.2):
    return rng.uniform(lo, hi, (h, w)).astype(np.float32)


def test_points_hf_sdf_golden(ref_tu):
    """Window-accelerated box-column SDF == the reference's all-boxes scan
    (util/terrain_util.py:1835-1893), interior (inverted) and exterior."""
    torch, tu = ref_tu
    rng = np.random.default_rng(0)
    hf = _rand_hf(rng)
    dxdy = np.asarray([0.4, 0.4], np.float32)
    min_point = np.asarray([-1.0, -2.0], np.float32)
    # points across the terrain, above and below the surface
    pts = np.stack([
        rng.uniform(-1.0, -1.0 + 11 * 0.4, 256),
        rng.uniform(-2.0, -2.0 + 9 * 0.4, 256),
        rng.uniform(-1.0, 2.0, 256),
    ], axis=-1).astype(np.float32)

    for inverted in (True, False):
        ref = tu.points_hf_sdf(
            torch.tensor(pts).unsqueeze(0), torch.tensor(hf).unsqueeze(0),
            torch.tensor(min_point).unsqueeze(0), torch.tensor(dxdy),
            inverted=inverted)[0].numpy()
        # window large enough to cover the whole grid -> exact everywhere
        ours = np.asarray(terrain_lib.points_hf_sdf(
            jnp.asarray(pts), jnp.asarray(hf), jnp.asarray(min_point),
            jnp.asarray(dxdy), inverted=inverted, window=12))
        np.testing.assert_allclose(ours, ref, atol=2e-5,
                                   err_msg=f"inverted={inverted}")

    # the production window only guarantees |sdf| < window*dx: check the
    # default window agrees wherever the reference SDF is within range
    ref = tu.points_hf_sdf(
        torch.tensor(pts).unsqueeze(0), torch.tensor(hf).unsqueeze(0),
        torch.tensor(min_point).unsqueeze(0), torch.tensor(dxdy),
        inverted=True)[0].numpy()
    ours = np.asarray(terrain_lib.points_hf_sdf(
        jnp.asarray(pts), jnp.asarray(hf), jnp.asarray(min_point),
        jnp.asarray(dxdy), inverted=True))
    near = np.abs(ref) < 3 * 0.4
    assert near.sum() > 50
    np.testing.assert_allclose(ours[near], ref[near], atol=2e-5)


def test_pool_ops_golden(ref_tu):
    """maxpool / minpool / 1d variants with hf_maxmin clamps
    (util/terrain_util.py:1595-1630). Reference pools in place."""
    torch, tu = ref_tu
    rng = np.random.default_rng(1)
    hf = _rand_hf(rng)
    maxmin = np.stack([hf + rng.uniform(0.0, 0.5, hf.shape),
                       hf - rng.uniform(0.0, 0.5, hf.shape)],
                      axis=-1).astype(np.float32)

    # reference maxpool_size=s means a centered (2s+1) kernel; our API takes
    # the raw window size (odd windows are SAME-centered, identical result)
    for ref_size in (1, 2):
        win = 2 * ref_size + 1
        for name, ref_fn, ours_fn in (
                ("max", tu.maxpool_hf, terrain_lib.maxpool_hf),
                ("min", tu.minpool_hf, terrain_lib.minpool_hf)):
            t = torch.tensor(hf.copy())
            ref_fn(t, torch.tensor(maxmin), ref_size)
            ours = np.asarray(ours_fn(jnp.asarray(hf), jnp.asarray(maxmin),
                                      win))
            np.testing.assert_allclose(ours, t.numpy(), atol=1e-6,
                                       err_msg=f"{name} ref_size={ref_size}")


def test_merge_hfs_golden(ref_tu):
    """merge_hfs: keep hf1 under the motion mask, hf2 (maxmin-clamped)
    elsewhere (util/terrain_util.py:1349-1365)."""
    torch, tu = ref_tu
    rng = np.random.default_rng(5)
    hf1 = _rand_hf(rng)
    hf2 = _rand_hf(rng, lo=-2.0, hi=2.0)
    mask = rng.uniform(size=hf1.shape) < 0.4
    maxmin = np.stack([hf1 + 0.3, hf1 - 0.3], axis=-1).astype(np.float32)

    ref = tu.merge_hfs(torch.tensor(hf1), torch.tensor(mask),
                       torch.tensor(maxmin), torch.tensor(hf2))
    ours = np.asarray(terrain_lib.merge_hfs(
        jnp.asarray(hf1), jnp.asarray(mask), jnp.asarray(maxmin),
        jnp.asarray(hf2)))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)

    # maxmin=None passthrough
    ref = tu.merge_hfs(torch.tensor(hf1), torch.tensor(mask), None,
                       torch.tensor(hf2))
    ours = np.asarray(terrain_lib.merge_hfs(
        jnp.asarray(hf1), jnp.asarray(mask), None, jnp.asarray(hf2)))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def test_hf_from_motion_discrete_heights(ref_tu):
    """Discrete-heights terrain snap == a direct transliteration of the
    reference's post-FK cell loop (util/terrain_util.py:697-737: scatter-min
    of body z per cell, 7x7 min-pool, first ascending level above
    min_z - 0.5 on masked cells, heights[0] elsewhere)."""
    torch, tu = ref_tu
    rng = np.random.default_rng(7)
    dims = (14, 11)
    heights = np.asarray([-2.0, -1.0, 0.0, 0.8, 2.0], np.float32)
    min_point = np.asarray([-1.0, 0.5], np.float32)
    dxdy = np.asarray([0.4, 0.4], np.float32)
    body_pos = np.stack([
        rng.uniform(-1.2, -1.0 + 14 * 0.4, (30, 5)),
        rng.uniform(0.3, 0.5 + 11 * 0.4, (30, 5)),
        rng.uniform(-1.5, 2.5, (30, 5)),
    ], axis=-1).astype(np.float32)
    mask = rng.random(dims) < 0.6

    # reference loop, post-FK (terrain_util.py:706-737)
    min_h = np.full(dims, heights[-1], np.float32)
    for t in range(body_pos.shape[0]):
        for b in range(body_pos.shape[1]):
            ij = np.clip(np.round((body_pos[t, b, 0:2] - min_point) / dxdy)
                         .astype(int), 0, np.asarray(dims) - 1)
            min_h[ij[0], ij[1]] = min(min_h[ij[0], ij[1]], body_pos[t, b, 2])
    pool = torch.nn.MaxPool2d(kernel_size=7, stride=1, padding=3)
    min_h = -pool(-torch.tensor(min_h).unsqueeze(0))[0].numpy()
    ref_hf = np.full(dims, heights[0], np.float32)
    for i in range(dims[0]):
        for j in range(dims[1]):
            if mask[i, j]:
                for k in range(len(heights)):
                    if min_h[i, j] - 0.5 < heights[k]:
                        ref_hf[i, j] = heights[k]
                        break

    terr = terrain_lib.create_terrain(
        dims[0], dims[1], dx=0.4, min_x=-1.0, min_y=0.5).replace(
        hf_mask=jnp.asarray(mask))
    ours = terrain_lib.hf_from_motion_discrete_heights(terr, body_pos,
                                                       heights)
    np.testing.assert_allclose(np.asarray(ours.hf), ref_hf, atol=1e-6)


def _ref_terrain(tu, torch, hf, dx=0.4, min_x=-1.0, min_y=0.5):
    t = tu.SubTerrain("t", hf.shape[0], hf.shape[1], dx, dx, min_x, min_y,
                      device="cpu")
    t.hf = torch.tensor(hf)
    return t


def test_remove_sharp_lines_golden(ref_tu):
    """Sequential ridge/groove smoothing == reference remove_sharp_lines
    (util/terrain_util.py:260-290)."""
    torch, tu = ref_tu
    rng = np.random.default_rng(3)
    hf = _rand_hf(rng, 14, 11)
    t = _ref_terrain(tu, torch, hf)
    tu.remove_sharp_lines(t)
    ours = terrain_lib.remove_sharp_lines(hf)
    np.testing.assert_allclose(ours, t.hf.numpy(), atol=1e-6)


def test_flat_maxpool_3x3_golden(ref_tu):
    """Non-overlapping 3x3 block max == reference flat_maxpool_3x3
    (util/terrain_util.py:2099-2113), incl. untouched partial blocks."""
    torch, tu = ref_tu
    rng = np.random.default_rng(4)
    hf = _rand_hf(rng, 13, 11)  # non-multiples of 3 exercise the tail
    t = _ref_terrain(tu, torch, hf)
    tu.flat_maxpool_3x3(t)
    terr = terrain_lib.create_terrain(13, 11, dx=0.4)
    ours = terrain_lib.flat_maxpool_3x3(terr.replace(hf=jnp.asarray(hf)))
    np.testing.assert_allclose(np.asarray(ours.hf), t.hf.numpy(), atol=1e-6)


def test_downsample_terrain_golden(ref_tu):
    """2x2 max-pool downsample == reference downsample_terrain
    (util/terrain_util.py:1631-1673): heights, mask OR, doubled cell size."""
    torch, tu = ref_tu
    rng = np.random.default_rng(5)
    hf = _rand_hf(rng, 12, 10)
    mask = rng.random((12, 10)) < 0.3
    t = _ref_terrain(tu, torch, hf)
    t.hf_mask = torch.tensor(mask)
    ref = tu.downsample_terrain(t)
    terr = terrain_lib.create_terrain(12, 10, dx=0.4).replace(
        hf=jnp.asarray(hf), hf_mask=jnp.asarray(mask))
    ours = terrain_lib.downsample_terrain(terr)
    np.testing.assert_allclose(np.asarray(ours.hf), ref.hf.numpy(),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.hf_mask),
                                  ref.hf_mask.numpy())
    np.testing.assert_allclose(np.asarray(ours.dxdy), ref.dxdy.numpy())
