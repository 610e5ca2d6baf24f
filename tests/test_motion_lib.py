"""Motion data IO + motion library sampling tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec


@pytest.fixture(scope="module")
def model():
    return humanoid_spec().build()


def _make_clip(n=30, fps=30.0, seed=0, loop=md.CLAMP, with_terrain=True):
    rng = np.random.default_rng(seed)
    frames = np.zeros((n, 34), np.float32)
    t = np.arange(n) / fps
    frames[:, 0] = t * 1.5                       # walk forward
    frames[:, 2] = 0.9 + 0.03 * np.sin(t * 6)
    frames[:, 3:6] = 0.05 * rng.normal(size=(n, 3))
    frames[:, 6:] = 0.3 * np.sin(
        t[:, None] * rng.uniform(1, 5, 28) + rng.uniform(0, 6, 28))
    contacts = (rng.uniform(size=(n, 15)) < 0.2).astype(np.float32)
    terrain = None
    if with_terrain:
        terrain = md.HostTerrain(
            hf=rng.uniform(0, 0.5, (12, 10)).astype(np.float32),
            min_point=np.asarray([-1.0, -1.0]),
            dxdy=np.asarray([0.4, 0.4]))
    return md.MotionData(frames=frames, fps=fps, loop_mode=loop,
                         contacts=contacts, terrain=terrain)


def test_npz_round_trip(tmp_path, model):
    clip = _make_clip()
    clip.hf_mask_inds = [np.asarray([[1, 2], [3, 4]], np.int32),
                         np.zeros((0, 2), np.int32)] * 15
    path = str(tmp_path / "clip.npz")
    md.save_motion_data(path, clip)
    loaded = md.load_motion_data(path)
    np.testing.assert_allclose(loaded.frames, clip.frames)
    np.testing.assert_allclose(loaded.contacts, clip.contacts)
    np.testing.assert_allclose(loaded.terrain.hf, clip.terrain.hf)
    assert loaded.loop_mode == clip.loop_mode
    assert len(loaded.hf_mask_inds) == 30
    np.testing.assert_array_equal(loaded.hf_mask_inds[0], clip.hf_mask_inds[0])


def test_motion_lib_exact_frames(model):
    clips = [_make_clip(seed=i, n=20 + 5 * i) for i in range(3)]
    lib = ml.build_motion_lib(model, clips)
    assert lib.num_motions == 3
    # sampling exactly at frame times reproduces the source frames
    for mid, clip in enumerate(clips):
        ids = jnp.full((clip.num_frames,), mid, jnp.int32)
        times = jnp.arange(clip.num_frames) / clip.fps
        frame = ml.calc_motion_frame(lib, ids, times)
        f34 = ml.frames_34d(model, frame)
        ref = clip.frames.copy()
        # exp-maps may differ by 2*pi wrapping; compare via quaternions
        from parc_tpu.utils import rotation as rot
        q_a = rot.exp_map_to_quat(jnp.asarray(ref[:, 3:6]))
        q_b = rot.exp_map_to_quat(f34[:, 3:6])
        dots = np.abs(np.sum(np.asarray(q_a) * np.asarray(q_b), -1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(f34[:, 0:3]), ref[:, 0:3],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(f34[:, 6:]), ref[:, 6:],
                                   atol=2e-3)


def test_blending_midpoint(model):
    clip = _make_clip(seed=5)
    lib = ml.build_motion_lib(model, [clip])
    ids = jnp.zeros((1,), jnp.int32)
    t_mid = jnp.asarray([0.5 / clip.fps])
    frame = ml.calc_motion_frame(lib, ids, t_mid)
    expected = 0.5 * (clip.frames[0, 0:3] + clip.frames[1, 0:3])
    np.testing.assert_allclose(np.asarray(frame.root_pos[0]), expected,
                               atol=1e-5)


def test_wrap_looping(model):
    clip = _make_clip(seed=7, loop=md.WRAP)
    lib = ml.build_motion_lib(model, [clip])
    ids = jnp.zeros((1,), jnp.int32)
    length = float(lib.lengths[0])
    f0 = ml.calc_motion_frame(lib, ids, jnp.asarray([0.25 * length]))
    f1 = ml.calc_motion_frame(lib, ids, jnp.asarray([1.25 * length]))
    delta = np.asarray(lib.root_pos_delta[0])
    np.testing.assert_allclose(np.asarray(f1.root_pos[0]),
                               np.asarray(f0.root_pos[0]) + delta, atol=1e-4)


def test_weighted_sampling(model):
    clips = [_make_clip(seed=i) for i in range(2)]
    lib = ml.build_motion_lib(model, clips, weights=[0.9, 0.1])
    ids = ml.sample_motions(lib, jax.random.PRNGKey(0), 4000)
    frac = float(jnp.mean((ids == 0).astype(jnp.float32)))
    assert 0.85 < frac < 0.95


def test_reference_pkl_clip(reference_root, model):
    """Ingest a real reference-format .pkl motion clip with terrain."""
    clip = md.load_reference_pkl(
        str(reference_root / "data" / "terrains" / "civilization.pkl"))
    assert clip.frames.ndim == 2 and clip.frames.shape[1] == 34
    assert clip.terrain is not None and clip.terrain.hf.ndim == 2
    lib = ml.build_motion_lib(model, [clip])
    frame = ml.calc_motion_frame(
        lib, jnp.zeros((2,), jnp.int32), jnp.asarray([0.0, 0.5]))
    assert np.all(np.isfinite(np.asarray(frame.root_pos)))


def test_onehot_frame_gather_exact(model):
    """The one-hot MXU frame-table gather (TPU hot path) is bit-exact vs
    the native gather the CPU backend uses (anim/motion_lib.py
    calc_motion_frame dispatch)."""
    clips = [_make_clip(seed=i, n=20 + 7 * i,
                        loop=(md.WRAP if i % 2 else md.CLAMP))
             for i in range(3)]
    lib = ml.build_motion_lib(model, clips)
    ids = ml.sample_motions(lib, jax.random.PRNGKey(0), 257)
    # include the steps axis shape used by the tar-obs path and
    # out-of-range times (CLAMP end, WRAP cycling)
    times = ml.sample_time(lib, jax.random.PRNGKey(1), ids)[:, None] \
        + jnp.asarray([0.0, 0.033, 1.0, 5.0])
    ids = jnp.broadcast_to(ids[:, None], times.shape)

    native = ml.calc_motion_frame(lib, ids, times)
    orig = ml._use_onehot_rows
    ml._use_onehot_rows = lambda n: True
    try:
        onehot = ml.calc_motion_frame(lib, ids, times)
    finally:
        ml._use_onehot_rows = orig

    for name in ["root_pos", "root_rot", "root_vel", "root_ang_vel",
                 "joint_rot", "dof_vel", "contacts"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(native, name)),
            np.asarray(getattr(onehot, name)), err_msg=name)
