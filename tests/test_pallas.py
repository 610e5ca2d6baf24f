"""Fused Pallas substep kernel (physics/pallas_substep.py).

The kernel itself only lowers on TPU (tests force CPU, where
engine.control_step dispatches to the XLA path), so full state parity vs
the XLA lowering is gated on the backend and exercised on hardware; the
pure-math helpers are validated here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.physics import pallas_substep as ps


def test_atan2_polynomial():
    """In-kernel atan2 replacement (Mosaic has no atan2) matches numpy to
    f32 accuracy on the non-negative quadrant it is used in."""
    y, x = np.meshgrid(np.linspace(0, 1, 101), np.linspace(0, 1, 101))
    mask = (y + x) > 1e-6
    got = np.asarray(ps._atan2_nonneg(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    assert np.max(np.abs(got - want)[mask]) < 2e-6


def test_quat_exp_map_cols_matches_rot():
    from parc_tpu.utils import rotation as rot
    rng = np.random.default_rng(0)
    q = rot.quat_normalize(jnp.asarray(rng.normal(size=(256, 4))))
    cols = [q[:, i] for i in range(4)]
    got = np.stack([np.asarray(c)
                    for c in ps._quat_to_exp_map_cols(cols)], axis=-1)
    want = np.asarray(rot.quat_to_exp_map(q))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_layout_pack_roundtrip():
    model = humanoid_spec().build()
    lay = ps._state_layout(model)
    n = 5
    rng = np.random.default_rng(1)
    arrays = {
        "root_pos": rng.normal(size=(n, 3)), "root_rot": rng.normal(size=(n, 4)),
        "root_vel": rng.normal(size=(n, 3)),
        "root_ang_vel": rng.normal(size=(n, 3)),
        "joint_rot": rng.normal(size=(n, model.num_bodies - 1, 4)),
        "dof_vel": rng.normal(size=(n, model.dof_size)),
        "body_pos": rng.normal(size=(n, model.num_bodies, 3)),
        "body_rot": rng.normal(size=(n, model.num_bodies, 4)),
        "body_vel": rng.normal(size=(n, model.num_bodies, 3)),
        "body_ang_vel": rng.normal(size=(n, model.num_bodies, 3)),
    }
    arrays = {k: jnp.asarray(v, jnp.float32) for k, v in arrays.items()}
    packed = ps._pack(lay, arrays, n)
    assert packed.shape == (lay.total, n)
    for name, _ in lay.fields:
        o, k = lay.offsets[name]
        got = np.asarray(packed[o:o + k].T).reshape(arrays[name].shape)
        np.testing.assert_allclose(got, np.asarray(arrays[name]), atol=1e-7)


def test_torque_cols_matches_engine():
    """Column torque port == engine.compute_joint_torques for every
    control mode (pure jnp, no kernel)."""
    from parc_tpu.anim import char_model as cm
    from parc_tpu.anim import motion_lib as ml
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.physics import engine

    model = humanoid_spec().build()
    lib = ml.build_motion_lib(model, [walking_clip(seed=0)])
    n = 6
    frame = ml.calc_motion_frame(lib, jnp.zeros(n, jnp.int32),
                                 jnp.linspace(0.0, 1.0, n))
    state = engine.create_state(model, frame.root_pos, frame.root_rot,
                                frame.joint_rot, frame.root_vel,
                                frame.root_ang_vel, frame.dof_vel)
    rng = np.random.default_rng(2)
    act = jnp.asarray(rng.normal(0, 0.4, (n, model.dof_size)), jnp.float32)
    qtar = cm.dof_to_rot(model, act)
    h = 1.0 / 120.0
    jr_c = [[state.joint_rot[:, j, i] for i in range(4)]
            for j in range(model.num_bodies - 1)]
    qt_c = [[qtar[:, j, i] for i in range(4)]
            for j in range(model.num_bodies - 1)]
    dv_c = [state.dof_vel[:, d] for d in range(model.dof_size)]
    act_c = [act[:, d] for d in range(model.dof_size)]
    def stack(cols):
        return np.stack([np.broadcast_to(np.asarray(c), (n,))
                         for c in cols], axis=-1)

    for mode in ("pd_implicit", "pd_exp", "pd_1d", "vel", "torque"):
        params = engine.SimParams(control_mode=mode)
        tau_ref, dex_ref = engine.compute_joint_torques(model, params,
                                                        state, act, h)
        tau_c, dex_c = ps._torque_cols(model, params, jr_c, dv_c, act_c,
                                       qt_c, h)
        np.testing.assert_allclose(stack(tau_c), np.asarray(tau_ref),
                                   atol=3e-4, err_msg=mode)
        np.testing.assert_allclose(stack(dex_c), np.asarray(dex_ref),
                                   atol=1e-6, err_msg=mode)


def test_torque_cols_limit_branches_match_engine():
    """The column port's joint-limit torque matches the engine at states
    that actually VIOLATE the limits, for both the hard SPD-implicit
    boundary spring (the default) and the soft penalty springs — the
    nominal-state parity above exercises neither (limit torques vanish
    in the interior)."""
    from parc_tpu.anim import char_model as cm
    from parc_tpu.physics import engine

    model = humanoid_spec().build()
    n = 6
    rng = np.random.default_rng(5)
    lo = np.asarray(model.dof_limits_lower)
    hi = np.asarray(model.dof_limits_upper)
    # half the rows past the upper limits, half past the lower
    dof = np.where(np.arange(n)[:, None] % 2 == 0,
                   hi + rng.uniform(0.05, 0.3, (n, model.dof_size)),
                   lo - rng.uniform(0.05, 0.3, (n, model.dof_size)))
    dof = dof.astype(np.float32)
    q = cm.dof_to_rot(model, jnp.asarray(dof))
    state = engine.create_state(
        model, jnp.zeros((n, 3)),
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n, 1)), q,
        dof_vel=jnp.asarray(rng.normal(0, 2.0, (n, model.dof_size)),
                            jnp.float32))
    act = jnp.zeros((n, model.dof_size))
    qtar = cm.dof_to_rot(model, act)
    h = 1.0 / 120.0
    jr_c = [[state.joint_rot[:, j, i] for i in range(4)]
            for j in range(model.num_bodies - 1)]
    qt_c = [[qtar[:, j, i] for i in range(4)]
            for j in range(model.num_bodies - 1)]
    dv_c = [state.dof_vel[:, d] for d in range(model.dof_size)]
    act_c = [act[:, d] for d in range(model.dof_size)]

    def stack(cols):
        return np.stack([np.broadcast_to(np.asarray(c), (n,))
                         for c in cols], axis=-1)

    for hard in (True, False):
        params = engine.SimParams(hard_joint_limits=hard)
        tau_ref, dex_ref = engine.compute_joint_torques(model, params,
                                                        state, act, h)
        tau_c, dex_c = ps._torque_cols(model, params, jr_c, dv_c, act_c,
                                       qt_c, h)
        # dof violations of ~0.3 rad at K=5000 give |tau| up to ~1.5e3;
        # the column port round-trips through per-column exp maps, so
        # allow f32-scale relative error
        np.testing.assert_allclose(stack(tau_c), np.asarray(tau_ref),
                                   rtol=2e-4, atol=5e-3,
                                   err_msg=f"hard={hard}")
        np.testing.assert_allclose(stack(dex_c), np.asarray(dex_ref),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=f"hard={hard}")
        # the limit torque must actually be active somewhere
        assert float(np.abs(stack(tau_c)).max()) > 10.0


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pallas kernel lowers on TPU only; run manually "
                           "on hardware (parity ~1e-5 verified on v5e)")
def test_tpu_full_parity():
    from parc_tpu.anim import motion_lib as ml
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.physics import engine
    from parc_tpu.utils import terrain as terrain_lib

    model = humanoid_spec().build()
    lib = ml.build_motion_lib(model, [walking_clip(seed=0)])
    n = 33
    frame = ml.calc_motion_frame(lib, jnp.zeros(n, jnp.int32),
                                 jnp.linspace(0.0, 1.0, n))
    state = engine.create_state(model, frame.root_pos, frame.root_rot,
                                frame.joint_rot, frame.root_vel,
                                frame.root_ang_vel, frame.dof_vel)
    terrain = terrain_lib.create_terrain(16, 16, dx=0.4, min_x=-3.2,
                                         min_y=-3.2)
    act = jnp.zeros((n, model.dof_size))
    params_x = engine.SimParams(use_pallas=False)
    params_p = engine.SimParams(use_pallas=True)
    ref = jax.jit(lambda s: engine.control_step(
        model, params_x, terrain, s, act, sim_steps=2))(state)
    out = jax.jit(lambda s: engine.control_step(
        model, params_p, terrain, s, act, sim_steps=2))(state)
    for f in ("root_pos", "joint_rot", "dof_vel", "body_pos",
              "contact_forces"):
        np.testing.assert_allclose(np.asarray(getattr(out, f)),
                                   np.asarray(getattr(ref, f)), atol=2e-4)
