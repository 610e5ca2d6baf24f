"""Keypoint retargeting round trip (reference: pyroki_retarget/)."""

import numpy as np
import jax
import pytest

from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import walking_clip
from parc_tpu.retarget import keypoint_ik as rt


def test_roundtrip_recovers_motion():
    """Export keypoints from a real clip, retarget them back onto the same
    skeleton, and demand the recovered body positions match."""
    model = humanoid_spec().build()
    clip = walking_clip(seed=0, n=30)
    src = np.asarray(clip.frames)
    kps = rt.keypoints_from_motion(model, src)  # (T, 15, 3)

    # identity mapping: every body is a keypoint
    mapping = {n: n for n in model.body_names}
    frames, losses = rt.retarget_keypoints(
        model, kps, keypoint_names=model.body_names, mapping=mapping,
        cfg=rt.RetargetConfig(iters=800, optimize_scale=False))
    rec = rt.keypoints_from_motion(model, frames)
    err = np.linalg.norm(rec - kps, axis=-1)
    assert err.mean() < 0.06, err.mean()
    assert np.isfinite(frames).all()
    # joint limits respected
    assert np.all(frames[:, 6:] >= np.asarray(model.dof_limits_lower) - 1e-5)
    assert np.all(frames[:, 6:] <= np.asarray(model.dof_limits_upper) + 1e-5)


def test_smpl_mapping_resolves():
    model = humanoid_spec().build()
    kp_idx, body_idx = rt._mapping_indices(
        model, rt.DEFAULT_SMPL_TO_HUMANOID, rt.SMPL_JOINT_NAMES)
    assert len(kp_idx) == 15
    assert len(set(body_idx.tolist())) == 15
