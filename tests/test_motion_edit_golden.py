"""Golden parity for the motion mirror op vs the reference
(zmotion_editing_tools/motion_edit_lib.py:514-610 flip_motion_about_XZ_
plane): left-right body swap + XZ-plane reflection of root and joint
rotations.  Mirroring is used by kin_gen to double every generated clip;
a convention slip here poisons half the dataset.
"""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_edit as me
from parc_tpu.data.humanoid import humanoid_spec


def test_flip_motion_golden(reference_root):
    torch = pytest.importorskip("torch")
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from anim import kin_char_model as ref_cm
    from zmotion_editing_tools import motion_edit_lib as ref_me

    ref_model = ref_cm.KinCharModel("cpu")
    ref_model.load_char_file(
        str(reference_root / "data" / "assets" / "humanoid.xml"))
    model = humanoid_spec().build()

    rng = np.random.default_rng(9)
    t = 8
    frames = np.zeros((t, 34), np.float32)
    frames[:, 0:3] = rng.normal(size=(t, 3))
    # exp maps with angle < pi so dof<->rot round trips are unambiguous
    def em(shape):
        v = rng.normal(size=shape)
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
        return (v * rng.uniform(0.1, 2.8, shape[:-1] + (1,))).astype(
            np.float32)
    frames[:, 3:6] = em((t, 3))
    # dof layout: 4 spherical+hinge pairs interleaved as in the humanoid
    dof = np.zeros((t, 28), np.float32)
    for sl in (slice(0, 3), slice(3, 6), slice(6, 9), slice(10, 13),
               slice(14, 17), slice(18, 21), slice(21, 24), slice(25, 28)):
        dof[:, sl] = em((t, 3))
    for idx in (9, 13, 17, 24):  # elbows/knees: 1D hinges
        dof[:, idx] = rng.uniform(-2.0, 2.0, t).astype(np.float32)
    frames[:, 6:] = dof
    contacts = (rng.random((t, 15)) < 0.4).astype(np.float32)

    ref_f, ref_c = ref_me.flip_motion_about_XZ_plane(
        torch.tensor(frames), ref_model, torch.tensor(contacts))
    ours_f, ours_c = me.flip_motion_about_xz(
        model, jnp.asarray(frames), jnp.asarray(contacts))

    np.testing.assert_allclose(np.asarray(ours_f), ref_f.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_c), ref_c.numpy())
