"""Golden motion-sampling parity: the same real reference .pkl clip loaded
through the reference MotionLib (imported) and ours, compared at random
query times (slerp blends, CLAMP end handling, velocities)."""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec


def test_calc_motion_frame_golden_vs_reference(reference_root):
    torch = pytest.importorskip("torch")
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from anim import kin_char_model as ref_cm
    from anim import motion_lib as ref_ml

    pkl = str(reference_root / "data" / "terrains" / "civilization.pkl")
    ref_model = ref_cm.KinCharModel("cpu")
    ref_model.load_char_file(
        str(reference_root / "data" / "assets" / "humanoid.xml"))
    ref_lib = ref_ml.MotionLib(pkl, ref_model, "cpu", contact_info=False)

    model = humanoid_spec().build()
    lib = ml.build_motion_lib(model, [md.load_reference_pkl(pkl)])

    length = float(np.asarray(lib.lengths)[0])
    rng = np.random.default_rng(0)
    # interior times, exact frame times, the end, and past-the-end (CLAMP)
    times = np.concatenate([
        rng.uniform(0.0, length, 64),
        np.arange(8) / 30.0,
        [length, length + 0.5],
    ]).astype(np.float32)
    ids = np.zeros(times.shape, np.int64)

    rp, rr, rv, rav, jr, dv = ref_lib.calc_motion_frame(
        torch.tensor(ids), torch.tensor(times))
    ours = ml.calc_motion_frame(lib, jnp.asarray(ids, jnp.int32),
                                jnp.asarray(times))

    np.testing.assert_allclose(np.asarray(ours.root_pos), rp.numpy(),
                               atol=1e-4, err_msg="root_pos")
    # quaternions up to sign
    q_ref, q_ours = rr.numpy(), np.asarray(ours.root_rot)
    sign = np.sign(np.sum(q_ref * q_ours, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_ours * sign, q_ref, atol=1e-4,
                               err_msg="root_rot")
    jq_ref, jq_ours = jr.numpy(), np.asarray(ours.joint_rot)
    sign = np.sign(np.sum(jq_ref * jq_ours, axis=-1, keepdims=True))
    # 1e-3: a couple of elements sit on the slerp small-angle branch
    # boundary where f32 rounding differs between torch and XLA
    np.testing.assert_allclose(jq_ours * sign, jq_ref, atol=1e-3,
                               err_msg="joint_rot")
    np.testing.assert_allclose(np.asarray(ours.root_vel), rv.numpy(),
                               atol=1e-4, err_msg="root_vel")
    np.testing.assert_allclose(np.asarray(ours.root_ang_vel), rav.numpy(),
                               atol=1e-4, err_msg="root_ang_vel")
    np.testing.assert_allclose(np.asarray(ours.dof_vel), dv.numpy(),
                               atol=1e-4, err_msg="dof_vel")
