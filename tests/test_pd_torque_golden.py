"""Golden parity for the explicit PD torque paths vs the reference
(envs/ig_char_env.py:399-420 _calc_pd_exp_torque/_calc_pd_1d_torque):
tau = kp * expmap(q_cur^-1 q_tar) - kd * dof_vel, clamped to motor effort.
SURVEY §3.2 names this the mode the TPU sim must replicate exactly.

The reference methods live on the env class; their math is re-driven here
through the reference KinCharModel (dof_to_rot + compute_dof_vel), which
is exactly what the methods call.
"""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.anim import char_model as cm
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.physics import engine


def test_pd_exp_torque_golden(reference_root):
    torch = pytest.importorskip("torch")
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from anim import kin_char_model as ref_cm

    ref_model = ref_cm.KinCharModel("cpu")
    ref_model.load_char_file(
        str(reference_root / "data" / "assets" / "humanoid.xml"))
    model = humanoid_spec().build()

    n, rng = 32, np.random.default_rng(6)
    def rand_dof():
        d = rng.normal(size=(n, model.dof_size)).astype(np.float32) * 0.8
        return d
    sim_dof = rand_dof()
    tar_dof = rand_dof()
    dof_vel = rng.normal(size=(n, model.dof_size)).astype(np.float32) * 3.0

    kp = np.asarray(model.dof_stiffness, np.float32)
    kd = np.asarray(model.dof_damping, np.float32)
    effort = np.asarray(model.dof_motor_effort, np.float32)

    # reference: diff_dof = compute_dof_vel(dof_to_rot(sim), dof_to_rot(tar), 1)
    t = torch.tensor
    sim_rot = ref_model.dof_to_rot(t(sim_dof))
    tar_rot = ref_model.dof_to_rot(t(tar_dof))
    diff = ref_model.compute_dof_vel(sim_rot, tar_rot, 1.0)
    ref_tau = torch.clip(t(kp) * diff - t(kd) * t(dof_vel),
                         -t(effort), t(effort))

    # ours: pd_errors on a SimState holding the same joint rotations
    joint_rot = cm.dof_to_rot(model, jnp.asarray(sim_dof))
    state = engine.create_state(
        model, jnp.zeros((n, 3)), jnp.tile(jnp.asarray([0., 0., 0., 1.]),
                                           (n, 1)),
        joint_rot, dof_vel=jnp.asarray(dof_vel))
    params = engine.SimParams(control_mode="pd_exp",  # no limit torque:
                              hard_joint_limits=False,
                              limit_stiffness=0.0, limit_damping=0.0)
    tau, d_extra = engine.compute_joint_torques(
        model, params, state, jnp.asarray(tar_dof), dt=1.0 / 60.0)

    np.testing.assert_allclose(np.asarray(tau), ref_tau.numpy(),
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(d_extra) == 0.0)


def test_pd_1d_torque_golden(reference_root):
    """pd_1d: linear per-dof PD (reference _calc_pd_1d_torque)."""
    torch = pytest.importorskip("torch")
    model = humanoid_spec().build()
    n, rng = 32, np.random.default_rng(8)
    sim_dof = rng.normal(size=(n, model.dof_size)).astype(np.float32) * 0.8
    tar_dof = rng.normal(size=(n, model.dof_size)).astype(np.float32) * 0.8
    dof_vel = rng.normal(size=(n, model.dof_size)).astype(np.float32) * 3.0

    kp = np.asarray(model.dof_stiffness, np.float32)
    kd = np.asarray(model.dof_damping, np.float32)
    effort = np.asarray(model.dof_motor_effort, np.float32)

    joint_rot = cm.dof_to_rot(model, jnp.asarray(sim_dof))
    state = engine.create_state(
        model, jnp.zeros((n, 3)), jnp.tile(jnp.asarray([0., 0., 0., 1.]),
                                           (n, 1)),
        joint_rot, dof_vel=jnp.asarray(dof_vel))
    params = engine.SimParams(control_mode="pd_1d",  # no limit torque
                              hard_joint_limits=False,
                              limit_stiffness=0.0, limit_damping=0.0)
    tau, _ = engine.compute_joint_torques(
        model, params, state, jnp.asarray(tar_dof), dt=1.0 / 60.0)
    # rot_to_dof(dof_to_rot(x)) may wrap exp-maps; compare through the
    # same round trip the engine sees
    round_dof = np.asarray(cm.rot_to_dof(model, joint_rot))
    ref_tau = np.clip(kp * (tar_dof - round_dof) - kd * dof_vel,
                      -effort, effort)
    np.testing.assert_allclose(np.asarray(tau), ref_tau, rtol=1e-4,
                               atol=1e-4)
