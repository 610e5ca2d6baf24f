"""Tests for A*, motion editing, and motion optimization tools."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_edit
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import standing_clip, walking_clip
from parc_tpu.procgen import astar
from parc_tpu.utils import terrain as terrain_lib
from parc_tpu.utils import rotation as rot


@pytest.fixture(scope="module")
def model():
    return humanoid_spec().build()


# ---------------------------------------------------------------------------
# A*
# ---------------------------------------------------------------------------


def test_astar_flat():
    hf = np.zeros((20, 20), np.float32)
    path = astar.run_a_star(hf, np.asarray([0.4, 0.4]), (2, 2), (17, 17))
    assert path is not None
    assert tuple(path[0, :2]) == (2, 2)
    assert tuple(path[-1, :2]) == (17, 17)
    # steps are 8-connected
    d = np.abs(np.diff(path[:, :2], axis=0)).max(axis=1)
    assert np.all(d <= 1)


def test_astar_wall_detour():
    hf = np.zeros((20, 20), np.float32)
    hf[10, :15] = 5.0  # wall with a gap at the right
    path = astar.run_a_star(hf, np.asarray([0.4, 0.4]), (2, 2), (17, 2))
    assert path is not None
    crossing = path[path[:, 0] == 10]
    assert np.all(crossing[:, 1] >= 15)  # went around via the gap


def test_astar_jump_across_gap():
    hf = np.zeros((20, 20), np.float32)
    hf[9:11, :] = -3.0  # 0.8 m-wide chasm across the whole map
    settings = astar.AStarSettings(max_jump_dist=2.0, min_jump_gap=0.8)
    path = astar.run_a_star(hf, np.asarray([0.4, 0.4]), (2, 5), (17, 5),
                            settings)
    assert path is not None
    assert np.any(path[:, 2] == 1)  # used a jump edge
    # never stands in the chasm
    assert not np.any((path[:, 0] >= 9) & (path[:, 0] <= 10))


def test_astar_unreachable():
    hf = np.zeros((12, 12), np.float32)
    hf[6, :] = 10.0
    path = astar.run_a_star(hf, np.asarray([0.4, 0.4]), (2, 2), (10, 10),
                            astar.AStarSettings(max_jump_dist=0.0))
    assert path is None


# ---------------------------------------------------------------------------
# Motion editing
# ---------------------------------------------------------------------------


def test_mirror_involution(model):
    clip = walking_clip(seed=3)
    f = jnp.asarray(clip.frames)
    c = jnp.asarray(clip.contacts)
    f1, c1 = motion_edit.flip_motion_about_xz(model, f, c)
    f2, c2 = motion_edit.flip_motion_about_xz(model, f1, c1)
    # mirroring twice = identity (up to exp-map wrap)
    np.testing.assert_allclose(np.asarray(f2[:, 0:3]),
                               np.asarray(f[:, 0:3]), atol=1e-5)
    q_a = rot.exp_map_to_quat(f[:, 3:6])
    q_b = rot.exp_map_to_quat(f2[:, 3:6])
    dots = np.abs(np.sum(np.asarray(q_a) * np.asarray(q_b), -1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c), atol=1e-6)


def test_mirror_preserves_fk_geometry(model):
    """Mirrored motion's body positions are the mirror of the originals
    (with left/right bodies swapped)."""
    clip = walking_clip(seed=4)
    f = jnp.asarray(clip.frames[:5])
    fm, _ = motion_edit.flip_motion_about_xz(model, f, None)

    def fk(fr):
        return cm.forward_kinematics(
            model, fr[:, 0:3], rot.exp_map_to_quat(fr[:, 3:6]),
            cm.dof_to_rot(model, fr[:, 6:]))[0]

    pos = np.asarray(fk(f))
    pos_m = np.asarray(fk(fm))
    pairs = dict(motion_edit._mirror_pairs(model))
    swap = np.arange(model.num_bodies)
    for i, j in pairs.items():
        swap[i], swap[j] = j, i
    mirrored = pos[:, swap] * np.asarray([1, -1, 1])
    np.testing.assert_allclose(pos_m, mirrored, atol=1e-4)


def test_resample_fps(model):
    clip = walking_clip(seed=5)
    out = motion_edit.resample_fps(model, jnp.asarray(clip.frames), 30, 60)
    assert out.shape[0] == 2 * clip.frames.shape[0] - 1
    np.testing.assert_allclose(np.asarray(out[0]), clip.frames[0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[-1]), clip.frames[-1],
                               atol=1e-3)


def test_compute_contacts_standing(model):
    terrain = terrain_lib.create_terrain(24, 24, dx=0.4, min_x=-4.8,
                                         min_y=-4.8)
    frames = np.zeros((3, 34), np.float32)
    frames[:, 2] = 0.88  # feet at the ground
    c = np.asarray(motion_edit.compute_contacts(
        model, terrain, jnp.asarray(frames), eps=0.06))
    assert np.all(c[:, 11] == 1.0) and np.all(c[:, 14] == 1.0)  # feet
    assert np.all(c[:, 0] == 0.0)  # pelvis


def test_remove_hesitation():
    frames = np.zeros((60, 34), np.float32)
    frames[:20, 0] = np.linspace(0, 2, 20)      # moving
    frames[20:50, 0] = 2.0                      # frozen 30 frames
    frames[50:, 0] = np.linspace(2, 3, 10)      # moving
    out, _ = motion_edit.remove_hesitation_frames(frames, None)
    assert 30 < len(out) < 55


def test_motion_opt_reduces_penetration(model):
    from parc_tpu.opt.motion_opt import (MotionOptConfig,
                                         motion_contact_optimization)
    terrain = terrain_lib.create_terrain(24, 24, dx=0.4, min_x=-4.8,
                                         min_y=-4.8)
    clip = walking_clip(seed=6, n=20)
    frames = jnp.asarray(clip.frames)
    # sink the motion so feet penetrate the ground
    frames = frames.at[:, 2].add(-0.1)
    cfg = MotionOptConfig(iters=150)
    from parc_tpu.opt import motion_opt as mo
    _, losses0 = (lambda: (None, {
        k: float(v) for k, v in mo.motion_opt_loss(
            model, cfg, terrain, frames, frames,
            jnp.asarray(clip.contacts))[1].items()}))()
    out, losses = motion_contact_optimization(
        model, terrain, frames, jnp.asarray(clip.contacts), cfg)
    assert losses["penetration"] < losses0["penetration"] * 0.5
    assert np.all(np.isfinite(np.asarray(out)))


def test_motion_opt_batched_matches_single(model):
    """The batched padded/masked optimizer (one jitted Adam scan over K
    variable-length clips, each on ITS OWN terrain) matches the per-clip
    single path: the masked loss equals the single-clip loss at init, and
    the optimized frames agree (Adam is per-parameter and the clips'
    losses are block-separable, so joint == independent up to reduction
    reordering)."""
    from parc_tpu.opt import motion_opt as mo

    t0 = terrain_lib.create_terrain(24, 24, dx=0.4, min_x=-4.8, min_y=-4.8)
    t1 = terrain_lib.create_terrain(20, 20, dx=0.4, min_x=-4.0, min_y=-4.0,
                                    height=0.3)
    c0 = walking_clip(seed=6, n=20)
    c1 = walking_clip(seed=7, n=14)
    f0 = jnp.asarray(c0.frames).at[:, 2].add(-0.08)
    f1 = jnp.asarray(c1.frames).at[:, 2].add(0.3 - 0.06)
    ct0, ct1 = jnp.asarray(c0.contacts), jnp.asarray(c1.contacts)
    cfg = mo.MotionOptConfig(iters=40)

    # loss parity at init (padded/masked batched loss vs single)
    stacked = terrain_lib.stack_terrains([t0, t1])
    pad = np.concatenate([np.asarray(f1),
                          np.repeat(np.asarray(f1[-1:]), 6, axis=0)])
    frames_b = jnp.asarray(np.stack([np.asarray(f0), pad]))
    cpad = np.concatenate([np.asarray(ct1), np.zeros((6,) + ct1.shape[1:],
                                                     np.float32)])
    contacts_b = jnp.asarray(np.stack([np.asarray(ct0), cpad]))
    valid = jnp.asarray(np.stack([np.ones(20), np.r_[np.ones(14),
                                                     np.zeros(6)]]),
                        jnp.float32)
    totals, per = mo.motion_opt_loss_batched(
        model, cfg, stacked, jnp.arange(2), frames_b, frames_b,
        contacts_b, valid, constraints=None)
    for i, (t, f, c) in enumerate([(t0, f0, ct0), (t1, f1, ct1)]):
        single, _ = mo.motion_opt_loss(model, cfg, t, f, f, c,
                                       constraints=None)
        np.testing.assert_allclose(float(totals[i]), float(single),
                                   rtol=1e-4, err_msg=f"clip {i}")

    # end-to-end optimization parity
    out = mo.motion_contact_optimization_batched(
        model, [t0, t1], [f0, f1], [ct0, ct1], cfg, pad_to=26)
    for i, (t, f, c) in enumerate([(t0, f0, ct0), (t1, f1, ct1)]):
        ref, ref_losses = mo.motion_contact_optimization(model, t, f, c,
                                                         cfg)
        got, got_losses = out[i]
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, err_msg=f"clip {i}")
        for kk in ref_losses:
            np.testing.assert_allclose(got_losses[kk], ref_losses[kk],
                                       rtol=0.05, atol=1e-4,
                                       err_msg=f"clip {i} {kk}")


def test_motion_opt_body_constraints(model):
    """Contact-run body constraints (reference:
    motion_optimization.py:34-181): constraints are estimated per
    consecutive contact run, projected onto the terrain surface, and
    pin the body during the run — less foot drift than without."""
    from parc_tpu.opt import motion_opt as mo

    terrain = terrain_lib.create_terrain(24, 24, dx=0.4, min_x=-4.8,
                                         min_y=-4.8)
    # standing pose drifting 50 cm while the feet hover slightly above
    # contact_eps during tagged contacts: the sliding loss is blind here
    # (it gates on h_above < eps) — exactly the thin-ledge failure mode
    # the contact-run constraints fix
    t_len = 24
    frames = np.tile(standing_clip().frames[0], (t_len, 1)).astype(np.float32)
    frames[:, 0] += np.linspace(0.0, 0.5, t_len)   # root drift
    frames[:, 2] += 0.05                           # feet hover ~5 cm
    contacts = np.zeros((t_len, model.num_bodies), np.float32)
    lf = model.body_names.index("left_foot")
    rf = model.body_names.index("right_foot")
    contacts[2:20, lf] = 1.0
    contacts[:, rf] = 1.0

    cfg = mo.MotionOptConfig(iters=200)
    bc = mo.compute_approx_body_constraints(
        model, terrain, jnp.asarray(frames), jnp.asarray(contacts), cfg)
    assert bc.num_valid == 2                      # one run per foot
    valid = np.asarray(bc.valid)
    ids = np.asarray(bc.body_ids)[valid]
    assert set(ids.tolist()) == {lf, rf}
    se = list(zip(np.asarray(bc.starts)[valid].tolist(),
                  np.asarray(bc.ends)[valid].tolist()))
    assert (2, 19) in se and (0, t_len - 1) in se
    # projected constraint points sit on the terrain surface
    sd = np.asarray(terrain_lib.terrain_sdf(
        terrain, bc.points[valid], inverted=False))
    assert np.all(np.abs(sd) < 0.05)

    def foot_drift(frames34):
        from parc_tpu.anim import char_model as cmod
        from parc_tpu.utils import rotation as rotl
        rr = rotl.exp_map_to_quat(jnp.asarray(frames34)[:, 3:6])
        jr = cmod.dof_to_rot(model, jnp.asarray(frames34)[:, 6:])
        bp, _ = cmod.forward_kinematics(model, jnp.asarray(frames34)[:, 0:3],
                                        rr, jr)
        p = np.asarray(bp[2:20, lf, 0:2])
        return float(np.linalg.norm(p.max(0) - p.min(0)))

    out_c, losses_c = mo.motion_contact_optimization(
        model, terrain, jnp.asarray(frames), jnp.asarray(contacts), cfg,
        constraints=bc)
    cfg_nc = mo.MotionOptConfig(iters=200, auto_body_constraints=False)
    out_n, _ = mo.motion_contact_optimization(
        model, terrain, jnp.asarray(frames), jnp.asarray(contacts), cfg_nc)
    assert "body_constraint" in losses_c
    drift_c, drift_n = foot_drift(out_c), foot_drift(out_n)
    rmax = float(np.asarray(bc.radius)[valid].max())
    assert drift_n > 0.3                 # unconstrained foot follows source
    assert drift_c < drift_n             # constraint bounds the drift...
    assert drift_c < 2.0 * rmax + 0.1    # ...to the constraint ball
    assert np.all(np.isfinite(np.asarray(out_c)))


# ---------------------------------------------------------------------------
# Native (C++) components
# ---------------------------------------------------------------------------


def _path_cost(hf, dxdy, path, settings):
    """Deterministic edge-cost sum of a planned path (rand_cost_scale=0)."""
    import math
    total = 0.0
    for k in range(1, len(path)):
        i0, j0, _ = path[k - 1]
        i1, j1, jf = path[k]
        z0, z1 = hf[i0, j0], hf[i1, j1]
        dist = math.hypot((i1 - i0) * dxdy[0], (j1 - j0) * dxdy[1])
        if jf:
            total += settings.jump_cost_mult * (
                dist + settings.z_weight * abs(z1 - z0))
        else:
            lo = max(i1 - 1, 0), max(j1 - 1, 0)
            hi = min(i1 + 2, hf.shape[0]), min(j1 + 2, hf.shape[1])
            patch = hf[lo[0]:hi[0], lo[1]:hi[1]]
            bump = float(patch.max() - patch.min())
            total += (dist + settings.z_weight * abs(z1 - z0)
                      + settings.bumpiness_weight * bump * dist)
    return total


def test_native_astar_matches_python():
    """C++ planner (parc_tpu/native/astar.cpp) finds equal-cost paths to
    the pure-Python reference implementation on deterministic costs."""
    from parc_tpu import native
    from parc_tpu.procgen import astar as A
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    hf = np.zeros((40, 40), np.float32)
    hf[12:14, :30] = 2.0
    hf[20:26, 10:18] = -3.0
    hf += rng.uniform(0, 0.1, hf.shape).astype(np.float32)
    dxdy = np.asarray([0.4, 0.4])
    s = A.AStarSettings(rand_cost_scale=0.0)
    p_n = native.astar(hf, dxdy, (2, 2), (37, 37), s, seed=0)
    p_p = A.run_a_star(hf, dxdy, (2, 2), (37, 37), s, use_native=False)
    assert p_n is not None and p_p is not None
    c_n = _path_cost(hf, dxdy, p_n, s)
    c_p = _path_cost(hf, dxdy, p_p, s)
    assert abs(c_n - c_p) < 1e-2 * max(c_p, 1.0)
    # endpoints exact
    assert tuple(p_n[0][:2]) == (2, 2) and tuple(p_n[-1][:2]) == (37, 37)
    # unreachable case returns None
    wall = np.zeros((20, 20), np.float32)
    wall[10, :] = 100.0
    assert native.astar(wall, dxdy, (2, 2), (18, 18), s, seed=0) is None


def test_native_mesher_valid():
    """C++ voxelized mesher emits a watertight-indexed mesh covering every
    cell's top face."""
    from parc_tpu import native
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    hf = rng.uniform(0, 1, (12, 9)).astype(np.float32)
    v, t = native.hf_to_trimesh(hf, -1.0, -2.0, 0.4, 0.4)
    assert t.max() < len(v) and t.min() >= 0
    # at least 2 triangles per cell (top faces)
    assert len(t) >= 2 * hf.size
    # all cell-top heights present among vertex z values
    assert np.allclose(np.sort(np.unique(np.round(hf, 5))),
                       np.sort(np.intersect1d(np.round(np.unique(v[:, 2]), 5),
                                              np.round(np.unique(hf), 5))))


# ---------------------------------------------------------------------------
# Metrics / validation / converters (reference: tools/motion_tests,
# convert_parc_to_bvh.py, inspect_pkl.py)
# ---------------------------------------------------------------------------


def test_motion_metrics_and_stats():
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.tools import metrics
    model = humanoid_spec().build()
    clip = walking_clip(seed=0)
    m = metrics.compute_motion_metrics(model, clip)
    assert m.motion_length == 3.0
    assert np.isfinite(m.mean_jerk) and m.max_jerk >= m.mean_jerk
    assert m.pen_loss >= 0.0 and m.contact_loss >= 0.0
    stats = metrics.dataset_statistics(model, [clip])
    assert stats["max_jerk"] >= stats["mean_jerk"] > 0
    gp = metrics.guidance_params_from_stats(stats)
    assert gp.guide_jerk and gp.max_jerk == stats["max_jerk"]


def test_metrics_dir_csv(tmp_path):
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import standing_clip, walking_clip
    from parc_tpu.anim import motion_data as md
    from parc_tpu.tools import metrics
    model = humanoid_spec().build()
    md.save_motion_data(str(tmp_path / "a.npz"), standing_clip())
    md.save_motion_data(str(tmp_path / "b.npz"), walking_clip(seed=1))
    rows = metrics.evaluate_motion_dir(model, str(tmp_path),
                                       csv_path=str(tmp_path / "m.csv"))
    assert len(rows) == 2
    csv_text = (tmp_path / "m.csv").read_text()
    assert "mean_jerk" in csv_text and csv_text.count("\n") == 3


def test_bvh_export_and_inspect(tmp_path):
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.anim import motion_data as md
    from parc_tpu.tools import convert
    model = humanoid_spec().build()
    clip = walking_clip(seed=0)
    p = str(tmp_path / "c.npz")
    md.save_motion_data(p, clip)
    info = convert.inspect_motion(p)
    assert info["num_frames"] == 90 and info["has_terrain"]
    bvh = str(tmp_path / "c.bvh")
    convert.motion_to_bvh(model, clip, bvh)
    lines = open(bvh).read().splitlines()
    assert lines[0] == "HIERARCHY"
    assert any(l.startswith("Frames: 90") for l in lines)
    # channel count must match motion columns
    ncols = len(lines[-1].split())
    assert ncols == 6 + 3 * (model.num_bodies - 1)
    # euler roundtrip sanity: zero rotation -> zero angles
    import jax.numpy as jnp
    e = convert._quat_to_euler_zxy(np.asarray([[0.0, 0, 0, 1.0]]))
    np.testing.assert_allclose(e, 0.0, atol=1e-6)


def test_viewer_exports(tmp_path):
    """HTML viewer + matplotlib stills (MOTION_FORGE viewing core)."""
    import json, re
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.viewer import html_viewer, render
    model = humanoid_spec().build()
    clip = walking_clip(seed=0)
    nodes = np.asarray([[-3, -3, 0], [3, 3, 0]], np.float32)
    html_path = str(tmp_path / "v.html")
    html_viewer.export(model, clip, html_path, path_nodes=nodes)
    html = open(html_path).read()
    data = json.loads(re.search(r"const DATA = (.*?);\n", html, re.S).group(1))
    assert len(data["clips"]) == 1
    assert len(data["clips"][0]["body_pos"]) == 90
    assert len(data["clips"][0]["body_pos"][0]) == model.num_bodies
    assert data["terrain"] is not None and data["path"] is not None
    assert "<canvas" in html and "requestAnimation" in html or "setInterval" in html

    # multi-clip compare (reference vs recorded workflow)
    clip_b = walking_clip(seed=1, n=60)
    cmp_path = str(tmp_path / "cmp.html")
    html_viewer.export_compare(model, [clip, clip_b], cmp_path,
                               labels=["reference", "recorded"])
    d2 = json.loads(re.search(r"const DATA = (.*?);\n",
                              open(cmp_path).read(), re.S).group(1))
    assert [c["label"] for c in d2["clips"]] == ["reference", "recorded"]
    assert len(d2["clips"][1]["body_pos"]) == 60
    assert d2["clips"][0]["color"] != d2["clips"][1]["color"]

    png = str(tmp_path / "s.png")
    render.render_motion_strip(model, clip, png, path_nodes=nodes)
    assert (tmp_path / "s.png").stat().st_size > 5000
    render.render_pose_3d(model, clip, 10, str(tmp_path / "p.png"))
    assert (tmp_path / "p.png").stat().st_size > 5000


def test_procgen_courses_and_control_modes():
    """linear parkour course + cave procgen; torque/vel control modes."""
    import jax
    import jax.numpy as jnp
    from parc_tpu.utils import terrain as T
    from parc_tpu.physics import engine
    from parc_tpu.data.humanoid import humanoid_spec
    rng = np.random.default_rng(0)
    course = T.linear_parkour_course(rng)
    assert course.hf.shape == (48, 16)
    assert float(jnp.abs(course.hf).max()) > 0.1
    cave = T.generate_cave(rng)
    frac = float((np.asarray(cave.hf) > 0).mean())
    assert 0.05 < frac < 0.7

    # randomized vault/gap course: stations span full width, heights are
    # exactly the vault/gap values, spacing within [min,max] block spacing
    rc = T.random_linear_parkour_course(rng, x_dim=80, dx=0.4,
                                        gap_height=-1.5, vault_height=1.0)
    hf = np.asarray(rc.hf)
    assert hf.shape == (80, 16)
    station_rows = np.nonzero(np.abs(hf[:, 0]) > 1e-6)[0]
    assert len(station_rows) > 0
    for r in station_rows:
        assert np.all(hf[r] == hf[r, 0])          # full-width blocks
        assert hf[r, 0] in (-1.5, 1.0)
    heights = {hf[r, 0] for r in station_rows}
    assert len(heights) >= 1


def test_add_boxes_rotated_and_clamped():
    """Rotated box stamps + maxmin clamping (reference:
    util/terrain_util.py:864-917 add_boxes_to_hf2 — boxes rotate about
    their center by a uniform angle; hf_maxmin clamps the final hf)."""
    from parc_tpu.utils import terrain as T
    rng = np.random.default_rng(3)
    hf = np.zeros((32, 32), np.float32)
    out = T.add_boxes(rng, hf, num_boxes=12, box_min_height=0.5,
                      box_max_height=1.5, box_min_len=6, box_max_len=12)
    assert out.shape == hf.shape and np.all(hf == 0.0)  # input untouched
    assert float(np.abs(out).max()) >= 0.5

    # rotation is geometric, not an RNG-draw artifact: one large box
    # pinned at exactly 45 deg (min_angle == max_angle) leaves a diamond
    # footprint whose touched row-span width VARIES across rows — an
    # axis-aligned rectangle's span is constant on every touched row
    one = T.add_boxes(np.random.default_rng(0), hf, num_boxes=1,
                      box_min_height=1.0, box_max_height=1.0,
                      box_min_len=14, box_max_len=14,
                      min_angle=np.pi / 4, max_angle=np.pi / 4)
    spans = [int(r.sum()) for r in (one != 0.0) if r.any()]
    assert len(spans) >= 3 and len(set(spans)) >= 2, spans
    aa = T.add_boxes(np.random.default_rng(0), hf, num_boxes=1,
                     box_min_height=1.0, box_max_height=1.0,
                     box_min_len=14, box_max_len=14, max_angle=0.0)
    spans_aa = {int(r.sum()) for r in (aa != 0.0) if r.any()}
    assert len(spans_aa) == 1, spans_aa  # axis-aligned = constant width

    # maxmin clamp: bounds [-0.2, 0.2] everywhere -> output inside
    maxmin = np.stack([np.full_like(hf, 0.2), np.full_like(hf, -0.2)], -1)
    clamped = T.add_boxes(rng, hf, num_boxes=8, box_min_height=-2.0,
                          box_max_height=2.0, box_min_len=4, box_max_len=8,
                          hf_maxmin=maxmin)
    assert float(clamped.max()) <= 0.2 + 1e-6
    assert float(clamped.min()) >= -0.2 - 1e-6


def test_hf_from_motion_and_jump_carving():
    """hf_from_motion path terrain + jump-gap augmentation bounds
    (reference: util/terrain_util.py:597-700, :2017-2047)."""
    import jax.numpy as jnp
    from parc_tpu.utils import terrain as T

    # synthetic "motion": one contact point walking along +x at ground
    # level, jumping (z=1.2, well above jump_buf) over a long middle
    # stretch (wide enough to survive the 3x3 mask spread)
    tsteps = 60
    x = np.linspace(0.0, 6.0, tsteps)
    z = np.where((x > 2.0) & (x < 4.8), 1.2, 0.0)
    body_pos = np.stack([x, np.zeros(tsteps), z], -1)[:, None, :]  # (T,1,3)

    t = T.hf_from_motion(body_pos, dx=0.4, min_height=-2.0,
                         ground_height=0.0)
    hf = np.asarray(t.hf)
    mask = np.asarray(t.hf_mask)
    assert mask.any()
    assert np.all(hf[mask] == 0.0)       # path carved at ground height
    assert np.all(hf[~mask] == -2.0)     # low floor elsewhere

    # per-frame floor heights variant
    t2 = T.hf_from_motion(body_pos, dx=0.4,
                          floor_heights=np.linspace(0.0, 0.5, tsteps))
    hf2 = np.asarray(t2.hf)
    assert hf2[np.asarray(t2.hf_mask)].max() > 0.0

    # jump carving: cells under the jump may be carved down (hmin goes to
    # the global min), but their hmax stays below the flight path
    t3 = T.compute_hf_maxmin(t, jnp.asarray(body_pos))
    mm = np.asarray(t3.hf_maxmin)
    mask3 = np.asarray(t3.hf_mask)
    ij = np.round((body_pos[:, 0, 0:2] - np.asarray(t.min_point))
                  / np.asarray(t.dxdy)).astype(int)
    jump_cells = ij[(x > 2.8) & (x < 4.0)]
    for i, j in jump_cells:
        assert mm[i, j, 1] < -2.0 + 1e-5          # can carve a gap
        assert mm[i, j, 0] <= 1.2 - 0.8 + 1e-5    # not into flight path
    # grounded path cells stay pinned
    walk_cells = ij[x < 1.5]
    for i, j in walk_cells:
        assert mask3[i, j]
        assert abs(mm[i, j, 0] - hf[i, j]) < 0.1


def test_control_modes():
    """All five actuation modes produce finite torques; pd_1d == pd_exp on
    an all-hinge character; torque mode clamps to motor effort."""
    import jax.numpy as jnp
    from parc_tpu.physics import engine
    from parc_tpu.data.humanoid import humanoid_spec

    model = humanoid_spec().build()
    state = engine.create_state(
        model, root_pos=jnp.asarray([[0.0, 0.0, 1.0]]),
        root_rot=jnp.asarray([[0.0, 0, 0, 1.0]]),
        joint_rot=jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]),
                           (1, model.num_bodies - 1, 1)))
    for mode in ("torque", "vel", "pd_exp", "pd_1d", "pd_implicit"):
        p = engine.SimParams(control_mode=mode)
        tau, dex = engine.compute_joint_torques(
            model, p, state, jnp.full((1, model.dof_size), 0.1), 1 / 120)
        assert np.all(np.isfinite(np.asarray(tau))), mode
    # on an all-hinge character, linear dof error == exp-map error, so
    # pd_1d and pd_exp produce identical torques
    from parc_tpu.data.quadruped import quadruped_spec
    quad = quadruped_spec().build()
    qstate = engine.create_state(
        quad, root_pos=jnp.asarray([[0.0, 0.0, 0.5]]),
        root_rot=jnp.asarray([[0.0, 0, 0, 1.0]]),
        joint_rot=jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]),
                           (1, quad.num_bodies - 1, 1)))
    tgt = jnp.full((1, quad.dof_size), 0.3)
    tau_1d, _ = engine.compute_joint_torques(
        quad, engine.SimParams(control_mode="pd_1d"), qstate, tgt, 1 / 120)
    tau_exp, _ = engine.compute_joint_torques(
        quad, engine.SimParams(control_mode="pd_exp"), qstate, tgt, 1 / 120)
    assert np.allclose(np.asarray(tau_1d), np.asarray(tau_exp), atol=1e-4)
    # torque mode scales action by motor effort and clamps
    p = engine.SimParams(control_mode="torque")
    tau, _ = engine.compute_joint_torques(
        model, p, state, jnp.full((1, model.dof_size), 10.0), 1 / 120)
    assert np.allclose(np.asarray(tau)[0],
                       np.asarray(model.dof_motor_effort)
                       * p.torque_limit_scale)


def test_categorical_distribution():
    import jax
    import jax.numpy as jnp
    from parc_tpu.learning import distributions as D
    logits = jnp.asarray([[2.0, 0.0, -2.0], [0.0, 0.0, 0.0]])
    assert int(D.categorical_mode(logits)[0]) == 0
    lp = D.categorical_log_prob(logits, jnp.asarray([0, 1]))
    assert np.isclose(float(lp[1]), np.log(1 / 3), atol=1e-5)
    ent = D.categorical_entropy(logits)
    assert float(ent[1]) > float(ent[0])
    kl = D.categorical_kl(logits, logits)
    assert np.allclose(np.asarray(kl), 0.0, atol=1e-6)
    s = D.categorical_sample(jax.random.PRNGKey(0), logits)
    assert s.shape == (2,)


def test_obb_intersection_and_char_points():
    """OBB SAT test + dense char surface sampling
    (reference: util/geom_util.py:333-565, :788-931)."""
    import jax.numpy as jnp
    from parc_tpu.utils import geom
    from parc_tpu.utils import rotation as rot
    from parc_tpu.data.humanoid import humanoid_spec

    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    dims = jnp.asarray([0.5, 0.5, 0.5])
    # overlapping
    hit = geom.obb_obb_intersect(jnp.zeros(3), dims, ident,
                                 jnp.asarray([0.7, 0.0, 0.0]), dims, ident)
    assert bool(hit)
    # separated along x
    miss = geom.obb_obb_intersect(jnp.zeros(3), dims, ident,
                                  jnp.asarray([1.1, 0.0, 0.0]), dims, ident)
    assert not bool(miss)
    # rotated 45deg about z: diagonal reach sqrt(2)*0.5 + 0.5 ~ 1.207
    q45 = rot.exp_map_to_quat(jnp.asarray([0.0, 0.0, np.pi / 4]))
    hit45 = geom.obb_obb_intersect(jnp.zeros(3), dims, ident,
                                   jnp.asarray([1.15, 0.0, 0.0]), dims, q45)
    assert bool(hit45)
    miss45 = geom.obb_obb_intersect(jnp.zeros(3), dims, ident,
                                    jnp.asarray([1.3, 0.0, 0.0]), dims, q45)
    assert not bool(miss45)

    # point-OBB sdf: center is most inside
    pts = jnp.asarray([[[0.0, 0, 0], [0.5, 0, 0], [1.0, 0, 0]]])
    sdf = geom.points_obb_sdf(pts, jnp.zeros((1, 3)), dims[None], ident[None])
    assert float(sdf[0, 0]) < 0 < float(sdf[0, 2])
    assert abs(float(sdf[0, 1])) < 1e-6

    # char surface points cover every body with >= contact-point density
    spec = humanoid_spec()
    body_idx, offsets = geom.char_surface_points(spec)
    assert offsets.shape[0] == body_idx.shape[0] > 100
    assert set(body_idx.tolist()) == set(range(len(spec.bodies)))


def test_catmull_rom_and_straight_paths():
    from parc_tpu.procgen import astar as A
    nodes = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [2, 1, 0.5]],
                       np.float64)
    smooth = A.catmull_rom_path(nodes, points_per_segment=6)
    # passes through endpoints, more points, finite
    np.testing.assert_allclose(smooth[0], nodes[0], atol=1e-6)
    np.testing.assert_allclose(smooth[-1], nodes[-1], atol=1e-6)
    assert len(smooth) > len(nodes)
    assert np.all(np.isfinite(smooth))
    # interior curve stays near the control polygon
    d = np.linalg.norm(smooth[:, None, :2] - nodes[None, :, :2], axis=-1)
    assert d.min(axis=1).max() < 0.8
    line = A.straight_line_path([0, 0, 0], [2, 0, 0], 5)
    np.testing.assert_allclose(line[:, 0], [0, 0.5, 1.0, 1.5, 2.0])


def test_reference_terrain_pkl_ingestion():
    """Load a real reference terrain .pkl (TEASER_TERRAIN) and plan on it
    (parity proof: reference data files work end-to-end)."""
    import pathlib
    import pytest as _pytest
    pkl = pathlib.Path("/root/reference/data/terrains/TEASER_TERRAIN.pkl")
    if not pkl.exists():
        _pytest.skip("reference data unavailable")
    from parc_tpu.anim import motion_data as md
    from parc_tpu.procgen import astar as A
    t = md.load_reference_terrain_pkl(str(pkl))
    hf = np.asarray(t.hf)
    assert hf.shape == (102, 102)
    assert hf.min() < -10 and hf.max() > 4  # the teaser pits and towers
    # at least one random edge-to-edge pair must be plannable
    paths = []
    for seed in range(10):
        rng = np.random.default_rng(seed)
        s, e = A.pick_start_end_on_edges(hf, rng)
        p = A.run_a_star(hf, np.asarray(t.dxdy), s, e, rng=rng)
        if p is not None:
            paths.append(p)
    assert paths, "no plannable pair on the teaser terrain"
    p = paths[0]
    assert p.shape[1] == 3 and len(p) > 5
    world = A.path_to_world(p, np.asarray(t.min_point), np.asarray(t.dxdy),
                            hf)
    assert np.all(np.isfinite(world))


def test_augment_stage(tmp_path):
    """Batch terrain-aware augmentation (reference: augment_motions.py):
    heading rotation + stretch + terrain aug + contact opt, saved clips."""
    import dataclasses
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.anim import motion_data as md
    from parc_tpu.opt import motion_opt
    from parc_tpu.pipeline import augment

    model = humanoid_spec().build()
    clip = walking_clip(n=40, seed=0)
    cfg = augment.AugmentConfig(
        num_new_motions=2, terrain_aug="boxes_along_path",
        min_heading_angle=-30.0, max_heading_angle=30.0,
        opt_cfg=motion_opt.MotionOptConfig(iters=10))
    paths = augment.run_augment(model, [clip], str(tmp_path), cfg,
                                names=["walk.npz"], seed=0)
    assert len(paths) == 2
    for p in paths:
        out = md.load_motion_data(p)
        assert out.frames.shape[1] == 34
        assert out.terrain is not None
        assert np.all(np.isfinite(out.frames))
    # boxes_along_path must have changed the terrain heights somewhere
    out = md.load_motion_data(paths[0])
    assert np.abs(out.terrain.hf).max() > 0.0

    # height_scale rescales the whole heightfield outside the bad range
    base = np.asarray(clip.terrain.hf) + 1.0
    clip2 = dataclasses.replace(
        clip, terrain=dataclasses.replace(clip.terrain,
                                          hf=base.astype(np.float32)))
    cfg2 = augment.AugmentConfig(
        num_new_motions=1, terrain_aug="height_scale",
        min_h_scale=0.5, max_h_scale=0.7, bad_h_range=(0.99, 1.01),
        opt_cfg=motion_opt.MotionOptConfig(iters=5))
    (p2,) = augment.run_augment(model, [clip2], str(tmp_path / "hs"), cfg2,
                                seed=1)
    out2 = md.load_motion_data(p2)
    ratio = out2.terrain.hf / base
    assert 0.45 < float(ratio.mean()) < 0.75


def test_keypoint_export_roundtrip(tmp_path, model):
    """SMPL-keypoint export (reference: convert_parc_to_pyroki.py) feeds
    straight back into the keypoint retargeter."""
    from parc_tpu.anim import motion_data as md
    from parc_tpu.tools import convert
    clip = walking_clip(n=8, seed=0)
    out = str(tmp_path / "kp.npz")
    res = convert.motion_to_keypoints(model, clip, out)
    z = np.load(out, allow_pickle=False)
    kp = z["keypoints"]
    assert kp.shape[0] == 8 and kp.shape[2] == 3
    assert len(z["names"]) == kp.shape[1] >= 10
    assert "pelvis" in list(z["names"])
    assert np.all(np.isfinite(kp))
    # pelvis keypoint tracks the root trajectory
    pel = kp[:, list(z["names"]).index("pelvis")]
    np.testing.assert_allclose(pel, clip.frames[:, 0:3], atol=1e-5)


def test_static_motion_nan_gradients(model):
    """Regression: exactly-static motions produce zero jerk/vel vectors;
    linalg.norm has a NaN gradient at zero, which poisoned motion_opt and
    sampling-time guidance on standing clips."""
    import jax
    from parc_tpu.data.synthetic import standing_clip
    from parc_tpu.opt import motion_opt as mo

    m = standing_clip()
    terrain = m.terrain.to_device()
    cfg = mo.MotionOptConfig(iters=30)
    frames = jnp.asarray(m.frames)
    contacts = jnp.asarray(m.contacts)
    g = jax.grad(lambda x: mo.motion_opt_loss(
        model, cfg, terrain, x, frames, contacts)[0])(frames)
    assert np.all(np.isfinite(np.asarray(g)))
    out, losses = mo.motion_contact_optimization(model, terrain, frames,
                                                 contacts, cfg)
    assert np.all(np.isfinite(np.asarray(out)))
    assert all(np.isfinite(v) for v in losses.values())

    # guidance hinges on a static prediction must also be differentiable
    from parc_tpu.diffusion import guidance as guid
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.anim import motion_lib as ml
    lib = ml.build_motion_lib(model, [m])
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=32)
    gp = guid.GuidanceParams(guide_speed=True, guide_acc=True,
                             guide_jerk=True, use_target=True, use_hf=True)
    x_std = jnp.zeros((2, mdm.scfg.seq_len, mdm.frame_dim))
    hf = jnp.zeros((2, 31, 31))
    tgt = jnp.zeros((2, 2))
    gg = jax.grad(lambda x: guid.guidance_loss(mdm, state, x, hf, tgt,
                                               gp))(x_std)
    assert np.all(np.isfinite(np.asarray(gg)))


def test_flatten_4x4_near_edge():
    """4x4 flatten aligns to even indices with the cell in the middle 2x2
    (reference: util/terrain_util.py:2115-2133)."""
    from parc_tpu.utils import terrain as terrain_lib
    hf = np.arange(100, dtype=np.float32).reshape(10, 10)
    out = terrain_lib.flatten_4x4_near_edge(hf, (4, 5), 7.0)
    # even i=4 -> x [2,6); odd j=5 -> y [4,8)
    assert (out[2:6, 4:8] == 7.0).all()
    assert out[1, 4] == hf[1, 4] and out[6, 4] == hf[6, 4]
    assert out[2, 3] == hf[2, 3] and out[2, 8] == hf[2, 8]
    # clipped at the boundary, no wraparound
    out2 = terrain_lib.flatten_4x4_near_edge(hf, (0, 0), -1.0)
    assert (out2[0:2, 0:2] == -1.0).all()
    assert out2[9, 9] == hf[9, 9]


# ---------------------------------------------------------------------------
# Spatial/temporal motion edit ops (motion_edit_lib parity)
# ---------------------------------------------------------------------------


def test_translate_rotate_heading_roundtrip(model):
    import jax.numpy as jnp
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.utils import rotation as rot
    f = walking_clip(seed=3).frames

    # translate then undo
    t = np.asarray([1.0, -2.0, 0.5])
    f2 = motion_edit.translate_motion(f, t)
    np.testing.assert_allclose(f2[:, 0:3], f[:, 0:3] + t, atol=1e-6)

    # rotate 90 deg about origin: x axis -> y axis
    q = np.asarray(rot.heading_to_quat(jnp.asarray(np.pi / 2)))
    f3 = motion_edit.rotate_motion(f, q, np.zeros(3))
    np.testing.assert_allclose(f3[:, 1], f[:, 0], atol=1e-5)
    np.testing.assert_allclose(f3[:, 0], -f[:, 1], atol=1e-5)

    # change_heading_at_frame pins the heading of the chosen frame
    f4 = motion_edit.change_heading_at_frame(f, 1.1, 5)
    q5 = rot.exp_map_to_quat(jnp.asarray(f4[5, 3:6]))
    assert abs(float(rot.calc_heading(q5)) - 1.1) < 1e-4
    # pivot frame root xy unchanged
    np.testing.assert_allclose(f4[5, 0:3], f[5, 0:3], atol=1e-5)

    # move to origin
    f5 = motion_edit.move_xy_root_to_origin(f4)
    np.testing.assert_allclose(f5[0, 0:2], 0.0, atol=1e-6)
    assert abs(f5[0, 2] - f4[0, 2]) < 1e-6


def test_cut_stride_stitch_scale(model):
    from parc_tpu.data.synthetic import walking_clip
    f = walking_clip(seed=4).frames
    n = f.shape[0]

    cut = motion_edit.cut_motion(f, 10, 19)
    assert cut.shape[0] == n - 10
    np.testing.assert_allclose(cut[10], f[20])

    strided = motion_edit.stride_motion(f, 10, 30, 2)
    assert strided.shape[0] < n

    st = motion_edit.stitch_motions(f[:20], f[20:])
    np.testing.assert_allclose(st, f)

    scaled = motion_edit.scale_motion_segment(f, 1.5, 10, 30)
    disp_old = f[30, 0:2] - f[10, 0:2]
    disp_new = scaled[30, 0:2] - scaled[10, 0:2]
    np.testing.assert_allclose(disp_new, 1.5 * disp_old, atol=1e-5)
    # continuity: post-segment displacement unchanged
    np.testing.assert_allclose(scaled[-1, 0:2] - scaled[30, 0:2],
                               f[-1, 0:2] - f[30, 0:2], atol=1e-5)


def test_spatially_vary_and_pen_correction(model):
    from parc_tpu.data.synthetic import walking_clip
    clip = walking_clip(seed=5)
    rng = np.random.default_rng(0)
    varied = motion_edit.spatially_vary_motion(model, clip.frames,
                                               clip.contacts, rng)
    assert varied.shape == clip.frames.shape
    # joint dofs untouched by spatial variation
    np.testing.assert_allclose(varied[:, 6:], clip.frames[:, 6:], atol=1e-6)
    assert not np.allclose(varied[:, 0:2], clip.frames[:, 0:2])

    # push the clip below ground; correction lifts every frame back out
    sunk = motion_edit.translate_motion(clip.frames, [0.0, 0.0, -0.5])
    fixed = motion_edit.correct_foot_ground_pen(model, sunk)
    assert np.all(fixed[:, 2] >= sunk[:, 2] - 1e-6)
    refixed = motion_edit.correct_foot_ground_pen(model, fixed)
    np.testing.assert_allclose(refixed[:, 2], fixed[:, 2], atol=2e-3)


def test_motion_match_search_and_stitch(model):
    """Motion-matching transition search (reference
    motion_edit_lib.py:1025-1128): a rigidly transformed copy of the same
    clip must match at the same phase, the returned alignment must undo the
    transform, and the one-click stitch must be continuous at the seam."""
    import jax.numpy as jnp
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.utils import rotation as rot
    clip = walking_clip(seed=6)
    f = clip.frames
    q = np.asarray(rot.heading_to_quat(jnp.asarray(0.9)))
    f_b = motion_edit.translate_motion(
        motion_edit.rotate_motion(f, q, np.zeros(3)), [2.0, -1.0, 0.0])

    # search A's frames around 20 against all of B: the canonical features
    # are invariant to the rigid transform, so frame i of A matches frame
    # i of B exactly
    ia, ib, hd, dp, err = motion_edit.search_for_matching_motion_frames(
        model, f, f_b, clip.fps, range_a=(20, 21))
    assert ia == 20 and ib == 20
    assert err < 1e-3

    # the alignment undoes the rigid transform
    aligned = motion_edit.align_matched_motion(f_b, hd, dp)
    np.testing.assert_allclose(aligned[:, 0:3], f[:, 0:3], atol=1e-4)
    np.testing.assert_allclose(aligned[:, 3:6], f[:, 3:6], atol=1e-4)

    # stitch: A[:ia+1] + aligned B[ib+1:] == the original clip
    out = motion_edit.stitch_at_match(model, f, f_b, clip.fps,
                                      range_a=(20, 21))
    assert out.shape == f.shape
    np.testing.assert_allclose(out, f, atol=1e-4)
