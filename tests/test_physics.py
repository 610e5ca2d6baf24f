"""Physics engine tests: analytic free fall, stability, determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import char_model as cm
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.physics import engine
from parc_tpu.utils import terrain as terrain_lib


@pytest.fixture(scope="module")
def model():
    return humanoid_spec().build()


@pytest.fixture(scope="module")
def flat_terrain():
    return terrain_lib.create_terrain(64, 64, dx=0.4, min_x=-12.8, min_y=-12.8)


def _default_state(model, batch=(), z=0.95):
    root_pos = jnp.zeros(batch + (3,)).at[..., 2].set(z)
    root_rot = jnp.zeros(batch + (4,)).at[..., 3].set(1.0)
    joint_rot = jnp.zeros(batch + (model.num_bodies - 1, 4)).at[..., 3].set(1.0)
    return engine.create_state(model, root_pos, root_rot, joint_rot)


def test_free_fall_analytic(model, flat_terrain):
    """With no torques and no contact, ABA must produce pure -g root
    acceleration and zero joint accelerations (gravity is uniform)."""
    passive = model.replace(
        dof_stiffness=jnp.zeros_like(model.dof_stiffness),
        dof_damping=jnp.zeros_like(model.dof_damping))
    params = engine.SimParams(limit_stiffness=0.0, limit_damping=0.0)
    state = _default_state(passive, z=100.0)

    tau = jnp.zeros((passive.dof_size,))
    f_ext = jnp.zeros((passive.num_bodies, 6))
    root_acc, qdd = engine.aba(passive, params, state, tau, tau, f_ext, 1 / 120)
    np.testing.assert_allclose(np.asarray(root_acc[0:3]), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(root_acc[3:6]), [0, 0, -9.81],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(qdd), 0.0, atol=2e-3)

    # integrate 0.5 s and check ballistic root height
    step = jax.jit(lambda s: engine.sim_step(
        passive, params, flat_terrain, s,
        jnp.zeros((passive.dof_size,))))
    for _ in range(30):
        state = step(state)
    t = 30 * params.dt
    np.testing.assert_allclose(
        float(state.root_pos[2]), 100.0 - 0.5 * 9.81 * t * t, atol=5e-2)


def test_standing_stability(model, flat_terrain):
    """PD holding the default pose supports the body weight: joints hold
    their targets and ground reaction equals gravity.  (The statue slowly
    tips about its heels after ~1s — that is correct rigid-body physics for
    an unbalanced character, so we check the short horizon.)"""
    params = engine.SimParams()
    state = _default_state(model, batch=(4,), z=0.95)
    target = jnp.zeros((4, model.dof_size))

    step = jax.jit(lambda s: engine.control_step(
        model, params, flat_terrain, s, target))
    for _ in range(15):  # 0.5 seconds at 30 Hz
        state = step(state)
    z = np.asarray(state.root_pos[..., 2])
    assert np.all(np.isfinite(np.asarray(state.root_pos)))
    assert np.all(z > 0.8) and np.all(z < 1.0), z
    # feet carry the body's weight
    total_fz = np.asarray(jnp.sum(state.contact_forces[..., 2], axis=-1))
    weight = float(jnp.sum(model.body_mass)) * 9.81
    np.testing.assert_allclose(total_fz, weight, rtol=0.35)
    # joints track their PD targets (the collapse mode would bend knees/hips)
    from parc_tpu.anim import char_model as cm
    dof = np.asarray(cm.rot_to_dof(model, state.joint_rot))
    assert np.all(np.abs(dof) < 0.25), np.max(np.abs(dof))


def test_unbalanced_statue_falls(model, flat_terrain):
    """With no balance controller the humanoid must eventually topple —
    staying up forever would indicate non-physical contact."""
    params = engine.SimParams()
    state = _default_state(model, z=0.95)
    # slight initial lean: a bit-exact symmetric statue is an unstable
    # equilibrium that only float noise would break, which is
    # formulation-dependent — tip it physically instead
    from parc_tpu.utils import rotation as rot_lib
    tilt = rot_lib.exp_map_to_quat(jnp.asarray([0.05, 0.0, 0.0]))
    state = state.replace(root_rot=rot_lib.quat_mul(tilt, state.root_rot))
    state = engine.refresh_kinematics(model, state)
    target = jnp.zeros((model.dof_size,))
    step = jax.jit(lambda s: engine.control_step(
        model, params, flat_terrain, s, target))
    for _ in range(90):  # 3 seconds
        state = step(state)
    assert np.all(np.isfinite(np.asarray(state.root_pos)))
    assert float(state.root_pos[2]) < 0.6


def test_determinism(model, flat_terrain):
    params = engine.SimParams()
    state = _default_state(model, batch=(2,), z=0.95)
    target = jnp.asarray(
        np.random.default_rng(0).uniform(-0.2, 0.2, (2, model.dof_size)),
        jnp.float32)
    step = jax.jit(lambda s: engine.control_step(
        model, params, flat_terrain, s, target))
    s1 = step(state)
    s2 = step(state)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_contact_on_raised_platform(model):
    """Standing on a raised box of the heightfield works identically."""
    terrain = terrain_lib.create_terrain(64, 64, dx=0.4, min_x=-12.8,
                                         min_y=-12.8, height=0.0)
    terrain = terrain.replace(hf=terrain.hf.at[24:40, 24:40].set(1.0))
    params = engine.SimParams()
    state = _default_state(model, z=1.95)
    target = jnp.zeros((model.dof_size,))
    step = jax.jit(lambda s: engine.control_step(
        model, params, terrain, s, target))
    for _ in range(15):
        state = step(state)
    z = float(state.root_pos[2])
    assert 1.8 < z < 2.05, z


def test_aba_level_parallel_matches_reference():
    """The production level-parallel ABA must match the per-joint reference
    formulation to float32 noise on a randomized state."""
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import standing_clip
    from parc_tpu.envs.base import EnvConfig
    from parc_tpu.envs.deepmimic import DeepMimicEnv
    from parc_tpu.anim import motion_lib as ml

    model = humanoid_spec().build()
    env = DeepMimicEnv(model, engine.SimParams(), EnvConfig(num_envs=8))
    lib = ml.build_motion_lib(model, [standing_clip()])
    sim = env.reset(lib, jax.random.PRNGKey(0)).sim
    rng = np.random.default_rng(0)
    sim = sim.replace(
        root_vel=jnp.asarray(rng.normal(size=(8, 3)), jnp.float32),
        root_ang_vel=jnp.asarray(rng.normal(size=(8, 3)), jnp.float32),
        dof_vel=jnp.asarray(rng.normal(size=(8, model.dof_size)),
                            jnp.float32))
    sim = engine.refresh_kinematics(model, sim)
    tau = jnp.asarray(rng.normal(size=(8, model.dof_size)), jnp.float32)
    d_extra = jnp.asarray(rng.uniform(0, 0.1, (8, model.dof_size)),
                          jnp.float32)
    f_ext = jnp.asarray(rng.normal(size=(8, model.num_bodies, 6)),
                        jnp.float32)
    ra1, q1 = engine.aba_reference(model, env.sim_params, sim, tau, d_extra,
                                   f_ext, 1 / 120)
    ra2, q2 = engine.aba(model, env.sim_params, sim, tau, d_extra,
                         f_ext, 1 / 120)
    np.testing.assert_allclose(np.asarray(ra1), np.asarray(ra2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=1e-4, atol=1e-3)


def test_aba_soa_matches_reference_eager():
    """SoA (TPU production) ABA parity vs reference, evaluated eagerly
    (the SoA graph is intentionally never jitted on CPU)."""
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import standing_clip
    from parc_tpu.envs.base import EnvConfig
    from parc_tpu.envs.deepmimic import DeepMimicEnv
    from parc_tpu.anim import motion_lib as ml
    from parc_tpu.physics.aba_soa import aba_soa

    model = humanoid_spec().build()
    env = DeepMimicEnv(model, engine.SimParams(), EnvConfig(num_envs=8))
    lib = ml.build_motion_lib(model, [standing_clip()])
    sim = env.reset(lib, jax.random.PRNGKey(0)).sim
    rng = np.random.default_rng(1)
    sim = sim.replace(
        root_vel=jnp.asarray(rng.normal(size=(8, 3)), jnp.float32),
        root_ang_vel=jnp.asarray(rng.normal(size=(8, 3)), jnp.float32),
        dof_vel=jnp.asarray(rng.normal(size=(8, model.dof_size)),
                            jnp.float32))
    sim = engine.refresh_kinematics(model, sim)
    tau = jnp.asarray(rng.normal(size=(8, model.dof_size)), jnp.float32)
    d_extra = jnp.asarray(rng.uniform(0, 0.1, (8, model.dof_size)),
                          jnp.float32)
    f_ext = jnp.asarray(rng.normal(size=(8, model.num_bodies, 6)),
                        jnp.float32)
    ra1, q1 = engine.aba_reference(model, env.sim_params, sim, tau, d_extra,
                                   f_ext, 1 / 120)
    ra2, q2 = aba_soa(model, env.sim_params, sim, tau, d_extra,
                      f_ext, 1 / 120)
    np.testing.assert_allclose(np.asarray(ra1), np.asarray(ra2),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=1e-4, atol=1e-3)


def test_refresh_kinematics_soa_matches():
    """SoA kinematics refresh parity vs the batch-major FK (eager)."""
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.physics.aba_soa import refresh_kinematics_soa
    from parc_tpu.utils import rotation as rot

    model = humanoid_spec().build()
    rng = np.random.default_rng(2)
    n = 8
    st = engine.create_state(
        model,
        root_pos=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        root_rot=rot.quat_normalize(
            jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)),
        joint_rot=rot.quat_normalize(jnp.asarray(
            rng.normal(size=(n, model.num_bodies - 1, 4)), jnp.float32)),
        root_vel=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        root_ang_vel=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        dof_vel=jnp.asarray(rng.normal(size=(n, model.dof_size)),
                            jnp.float32))
    s2 = refresh_kinematics_soa(model, st)
    for f in ("body_pos", "body_rot", "body_vel", "body_ang_vel"):
        np.testing.assert_allclose(np.asarray(getattr(st, f)),
                                   np.asarray(getattr(s2, f)),
                                   rtol=1e-4, atol=1e-5)


def test_quadruped_character(flat_terrain):
    """Second character family: the engine is character-generic — a 12-DoF
    quadruped stands under PD and collapses without actuation."""
    from parc_tpu.data.quadruped import quadruped_spec, standing_pose_dof

    quad = quadruped_spec().build()
    assert quad.num_bodies == 13 and quad.dof_size == 12
    dof = jnp.asarray(standing_pose_dof())
    joint_rot = cm.dof_to_rot(quad, dof)
    st0 = engine.create_state(
        quad, root_pos=jnp.asarray([0.0, 0.0, 0.32]),
        root_rot=jnp.asarray([0.0, 0, 0, 1.0]), joint_rot=joint_rot)
    # contact params scaled to the ~11 kg robot (the defaults are tuned
    # for the 45 kg humanoid); per-robot sim params are standard practice
    params = engine.SimParams(contact_stiffness=2500.0,
                              contact_damping=100.0,
                              max_contact_force=400.0)
    step = jax.jit(lambda s, tgt: engine.control_step(
        quad, params, flat_terrain, s, tgt))
    st = st0
    for _ in range(30):
        st = step(st, dof)
    assert np.all(np.isfinite(np.asarray(st.root_pos)))
    assert 0.2 < float(st.root_pos[2]) < 0.45  # standing

    # passive (no stiffness) quadruped collapses
    passive = quad.replace(
        dof_stiffness=jnp.zeros_like(quad.dof_stiffness),
        dof_damping=quad.dof_damping)
    step_p = jax.jit(lambda s: engine.control_step(
        passive, params, flat_terrain, s, dof))
    st = st0
    for _ in range(45):
        st = step_p(st)
    assert float(st.root_pos[2]) < 0.2  # collapsed


def test_hard_joint_limits(model, flat_terrain):
    """hard_joint_limits=True (the default): the SPD-implicit boundary
    spring holds dof positions at [lower, upper] to within the boundary-
    spring equilibrium under the worst sustained load: saturated PD
    torque at the strongest joint (motor effort / hard_limit_stiffness =
    0.06 rad) plus gravity-borne joint loads, which are NOT capped by
    motor effort (a collapsing body can lean on a limit).  Measured
    worst violation here: 0.063 rad; assert < 0.08."""
    params = engine.SimParams(hard_joint_limits=True, use_pallas=False)
    state = _default_state(model, batch=(4,))
    # PD targets pushing every dof well past its upper limit
    tar = jnp.broadcast_to(model.dof_limits_upper + 1.0,
                           (4, model.dof_size))
    step = jax.jit(lambda s: engine.control_step(
        model, params, flat_terrain, s, tar))
    for _ in range(30):
        state = step(state)
    dof_pos = engine.dof_pos_from_state(model, state)
    lo = np.asarray(model.dof_limits_lower)
    hi = np.asarray(model.dof_limits_upper)
    over = np.asarray(dof_pos) - hi
    under = lo - np.asarray(dof_pos)
    bound = 0.08
    assert np.all(over < bound), float(over.max())
    assert np.all(under < bound), float(under.max())
    assert np.all(np.isfinite(np.asarray(state.root_pos)))


def test_hard_limits_inactive_in_interior(model):
    """The hard-limit boundary spring contributes NOTHING for interior dof
    states: torques match the soft mode (whose penalty springs also vanish
    in the interior), so the limit model only acts at the boundary."""
    rng = np.random.default_rng(3)
    lo = np.asarray(model.dof_limits_lower)
    hi = np.asarray(model.dof_limits_upper)
    dof = rng.uniform(lo + 0.05, np.maximum(hi - 0.05, lo + 0.05),
                      size=(8, model.dof_size)).astype(np.float32)
    q = cm.dof_to_rot(model, jnp.asarray(dof))
    state = _default_state(model, batch=(8,)).replace(joint_rot=q)
    state = state.replace(dof_vel=jnp.asarray(
        rng.normal(size=(8, model.dof_size)).astype(np.float32)))
    tar = jnp.zeros((8, model.dof_size))
    dt = 1.0 / 120.0
    t_hard, d_hard = engine.compute_joint_torques(
        model, engine.SimParams(hard_joint_limits=True), state, tar, dt)
    t_soft, d_soft = engine.compute_joint_torques(
        model, engine.SimParams(hard_joint_limits=False), state, tar, dt)
    np.testing.assert_allclose(np.asarray(t_hard), np.asarray(t_soft),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_hard), np.asarray(d_soft),
                               atol=1e-6)
