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


# ---------------------------------------------------------------------------
# URDF robot model (reference: pyroki_retarget/_robot_urdf_parser.py)
# ---------------------------------------------------------------------------

from parc_tpu.retarget import urdf as urdf_lib  # noqa: E402

_TEST_URDF = """
<robot name="arm">
  <link name="base"/>
  <link name="upper"/>
  <link name="fore"/>
  <link name="hand"/>
  <link name="tool"/>
  <joint name="shoulder" type="revolute">
    <parent link="base"/><child link="upper"/>
    <origin xyz="0 0 1" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="-1.5" upper="1.5"/>
  </joint>
  <joint name="elbow" type="revolute">
    <parent link="upper"/><child link="fore"/>
    <origin xyz="1 0 0" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="-2.0" upper="2.0"/>
  </joint>
  <joint name="wrist" type="fixed">
    <parent link="fore"/><child link="hand"/>
    <origin xyz="0.5 0 0" rpy="0 0 0"/>
  </joint>
  <joint name="slider" type="prismatic">
    <parent link="hand"/><child link="tool"/>
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="0" upper="0.3"/>
  </joint>
</robot>
"""


def test_urdf_parse_topology_and_limits():
    robot = urdf_lib.parse_urdf(_TEST_URDF)
    assert robot.name == "arm"
    assert robot.link_names[0] == "base"
    assert robot.num_dofs == 3          # shoulder, elbow, slider
    assert robot.actuated_names == ("shoulder", "elbow", "slider")
    np.testing.assert_allclose(robot.lower_limits, [-1.5, -2.0, 0.0])
    np.testing.assert_allclose(robot.upper_limits, [1.5, 2.0, 0.3])


def test_urdf_fk_analytic():
    robot = urdf_lib.parse_urdf(_TEST_URDF)
    # zero config: straight chain along +x, shoulder base at z=1
    pos, _ = urdf_lib.forward_kinematics(robot, np.zeros((1, 3)))
    pos = np.asarray(pos)[0]
    li = {n: i for i, n in enumerate(robot.link_names)}
    np.testing.assert_allclose(pos[li["upper"]], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(pos[li["fore"]], [1, 0, 1], atol=1e-5)
    np.testing.assert_allclose(pos[li["hand"]], [1.5, 0, 1], atol=1e-5)
    # bend the elbow 90 deg about z: hand swings to +y
    pos, _ = urdf_lib.forward_kinematics(
        robot, np.asarray([[0.0, np.pi / 2, 0.0]]))
    pos = np.asarray(pos)[0]
    np.testing.assert_allclose(pos[li["hand"]], [1.0, 0.5, 1], atol=1e-5)
    # prismatic extends the tool along the (rotated) z axis
    pos, _ = urdf_lib.forward_kinematics(
        robot, np.asarray([[0.0, 0.0, 0.25]]))
    pos = np.asarray(pos)[0]
    np.testing.assert_allclose(pos[li["tool"]], [1.5, 0, 1.25], atol=1e-5)
    # batched root transform: yaw the whole robot 90 deg
    import jax.numpy as jnp
    from parc_tpu.utils import rotation as rot
    yaw = rot.axis_angle_to_quat(jnp.asarray([0.0, 0.0, 1.0]),
                                 jnp.asarray(np.pi / 2))
    pos, _ = urdf_lib.forward_kinematics(
        robot, np.zeros((1, 3)), root_pos=np.zeros((1, 3)),
        root_quat=jnp.broadcast_to(yaw, (1, 4)))
    pos = np.asarray(pos)[0]
    np.testing.assert_allclose(pos[li["hand"]], [0, 1.5, 1], atol=1e-5)


def test_urdf_mimic_joint():
    robot = urdf_lib.parse_urdf("""
<robot name="m">
  <link name="a"/><link name="b"/><link name="c"/>
  <joint name="j1" type="revolute">
    <parent link="a"/><child link="b"/>
    <origin xyz="1 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="b"/><child link="c"/>
    <origin xyz="1 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3" upper="3"/>
    <mimic joint="j1" multiplier="0.5" offset="0"/>
  </joint>
</robot>""")
    assert robot.num_dofs == 1
    pos, quat = urdf_lib.forward_kinematics(
        robot, np.asarray([[np.pi / 2]]))
    # j1 rotates 90deg, j2 mimics at 45deg: c sits at (1, cos45, 0)+...
    c = np.asarray(pos)[0, robot.link_index("c")]
    np.testing.assert_allclose(
        c, [1 + np.cos(np.pi / 2), np.sin(np.pi / 2), 0], atol=1e-5)


_G1_URDF = ("/root/reference/pyroki_retarget/unitree_description/urdf/"
            "g1_retarget/main.urdf")


def _g1_fixture_keypoints(robot, t_len=8):
    """SMPL keypoint trajectory synthesized FROM the robot's zero pose
    (drifting forward) so the retarget optimum is known reachable."""
    from parc_tpu.retarget.keypoint_ik import SMPL_JOINT_NAMES
    q0 = np.zeros((t_len, robot.num_dofs), np.float32)
    pos, _ = urdf_lib.forward_kinematics(robot, q0)
    pos = np.asarray(pos)
    kps = np.zeros((t_len, len(SMPL_JOINT_NAMES), 3), np.float32)
    for smpl_name, link_name in urdf_lib.SMPL_TO_G1.items():
        kps[:, SMPL_JOINT_NAMES.index(smpl_name)] = (
            pos[:, robot.link_index(link_name)])
    kps[..., 0] += np.linspace(0, 0.2, t_len)[:, None]  # forward drift
    return kps


@pytest.mark.skipif(not __import__("os").path.exists(_G1_URDF),
                    reason="reference G1 URDF not present")
def test_g1_urdf_parse_and_fk():
    """Parse the Unitree G1 URDF and check the SMPL link map + FK
    (reference: 10_humanoid_retargeting.py target robot)."""
    robot = urdf_lib.parse_urdf(_G1_URDF)
    assert robot.num_dofs == 29
    for link in urdf_lib.SMPL_TO_G1.values():
        assert link in robot.link_names, link
    kps = _g1_fixture_keypoints(robot)
    assert np.isfinite(kps).all()
    # feet below pelvis in the zero pose
    from parc_tpu.retarget.keypoint_ik import SMPL_JOINT_NAMES
    pelvis_z = kps[0, SMPL_JOINT_NAMES.index("pelvis"), 2]
    ankle_z = kps[0, SMPL_JOINT_NAMES.index("left_ankle"), 2]
    assert ankle_z < pelvis_z


@pytest.mark.skipif(not __import__("os").path.exists(_G1_URDF),
                    reason="reference G1 URDF not present")
def test_g1_urdf_smpl_retarget():
    """End-to-end SMPL->G1 trajectory IK (reference:
    10_humanoid_retargeting.py).  Gated to accelerator backends: grad of
    the 42-joint URDF chain compiles pathologically on XLA CPU (~40 min;
    same deep-sequential-graph pattern as physics/aba_soa.py — see
    CLAUDE.md).  TPU evidence: tools/retarget_g1_demo.py."""
    import jax
    if jax.default_backend() == "cpu":
        pytest.skip("URDF-chain grad compile is pathological on XLA CPU; "
                    "run tools/retarget_g1_demo.py on TPU")
    robot = urdf_lib.parse_urdf(_G1_URDF)
    kps = _g1_fixture_keypoints(robot)
    root_pos, root_quat, q, losses = urdf_lib.retarget_keypoints_to_robot(
        robot, kps, cfg=urdf_lib.UrdfRetargetConfig(
            iters=200, optimize_scale=False))
    assert np.isfinite(q).all() and np.isfinite(root_pos).all()
    assert losses["global"] < 0.01, losses
    assert np.all(q >= robot.lower_limits - 1e-4)
    assert np.all(q <= robot.upper_limits + 1e-4)
