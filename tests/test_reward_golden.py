"""Golden parity for the tracker's reward/done kernels vs the reference's
jitted torch kernels (envs/ig_parkour/mgdm_dm_util.py compute_deepmimic_
reward :328-390, compute_contact_reward :556-576, compute_done :392-460).

The reward IS the north-star metric (tracker reward within 5% of the
reference), so the kernel math must match bit-for-bit semantics: same
error scales, same heading-local conversion when not tracking root, same
FAIL-overrides-TIME done precedence.

The reference module chain imports isaacgym/gym at module level; those are
stubbed (the compared kernels are pure torch).
"""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_data as md
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.envs.base import DoneFlags, EnvConfig, EnvState
from parc_tpu.envs.deepmimic import DeepMimicEnv
from parc_tpu.physics import engine
from parc_tpu.anim import char_model as cm


def _import_ref_util(reference_root):
    for name in ("gym", "trimesh", "isaacgym", "isaacgym.gymapi",
                 "isaacgym.gymtorch", "isaacgym.gymutil"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from envs.ig_parkour import mgdm_dm_util
    return mgdm_dm_util


def _rand_quats(rng, shape):
    q = rng.normal(size=shape + (4,))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def _rand_state(model, rng, n):
    """Random but FK-consistent character + reference states."""
    nb = model.num_bodies
    root_pos = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    root_pos[:, 2] += 0.9
    root_rot = _rand_quats(rng, (n,))
    joint_rot = _rand_quats(rng, (n, nb - 1))
    dof_vel = rng.normal(size=(n, model.dof_size)).astype(np.float32)
    root_vel = rng.normal(size=(n, 3)).astype(np.float32)
    root_ang_vel = rng.normal(size=(n, 3)).astype(np.float32)
    body_pos, body_rot = cm.forward_kinematics(
        model, jnp.asarray(root_pos), jnp.asarray(root_rot),
        jnp.asarray(joint_rot))
    return dict(root_pos=root_pos, root_rot=root_rot, joint_rot=joint_rot,
                dof_vel=dof_vel, root_vel=root_vel,
                root_ang_vel=root_ang_vel,
                body_pos=np.asarray(body_pos),
                body_rot=np.asarray(body_rot))


def _flat_clip(n=90, fps=30.0):
    frames = np.zeros((n, 34), np.float32)
    frames[:, 2] = 0.94
    contacts = np.zeros((n, 15), np.float32)
    contacts[:, [11, 14]] = 1.0
    terrain = md.HostTerrain(
        hf=np.zeros((32, 32), np.float32),
        min_point=np.asarray([-6.4, -6.4]), dxdy=np.asarray([0.4, 0.4]))
    return md.MotionData(frames=frames, fps=fps, contacts=contacts,
                         terrain=terrain)


def _env_state(env, sim_np, contact_forces, time, motion_times, n):
    sim = engine.SimState(
        root_pos=jnp.asarray(sim_np["root_pos"]),
        root_rot=jnp.asarray(sim_np["root_rot"]),
        root_vel=jnp.asarray(sim_np["root_vel"]),
        root_ang_vel=jnp.asarray(sim_np["root_ang_vel"]),
        joint_rot=jnp.asarray(sim_np["joint_rot"]),
        dof_vel=jnp.asarray(sim_np["dof_vel"]),
        body_pos=jnp.asarray(sim_np["body_pos"]),
        body_rot=jnp.asarray(sim_np["body_rot"]),
        body_vel=jnp.zeros_like(jnp.asarray(sim_np["body_pos"])),
        body_ang_vel=jnp.zeros_like(jnp.asarray(sim_np["body_pos"])),
        contact_forces=jnp.asarray(contact_forces))
    z = jnp.zeros((n,), jnp.float32)
    return EnvState(
        sim=sim, obs=z[:, None], terminal_obs=z[:, None], reward=z,
        done=jnp.zeros((n,), jnp.int32), time=jnp.asarray(time),
        terminal_times=z, motion_ids=jnp.zeros((n,), jnp.int32),
        motion_times=jnp.asarray(motion_times),
        start_times=z, rng=__import__("jax").random.PRNGKey(0),
        fail_rates=jnp.zeros((1,)),
        reward_components=jnp.zeros((n, 6)),
        tracking_error=jnp.zeros((n, 7)))


def _ref_frame(model, ref_np, contacts=None):
    n = ref_np["root_pos"].shape[0]
    if contacts is None:
        contacts = np.zeros((n, model.num_bodies), np.float32)
    return ml.MotionFrame(
        root_pos=jnp.asarray(ref_np["root_pos"]),
        root_rot=jnp.asarray(ref_np["root_rot"]),
        root_vel=jnp.asarray(ref_np["root_vel"]),
        root_ang_vel=jnp.asarray(ref_np["root_ang_vel"]),
        joint_rot=jnp.asarray(ref_np["joint_rot"]),
        dof_vel=jnp.asarray(ref_np["dof_vel"]),
        contacts=jnp.asarray(contacts))


@pytest.mark.parametrize("track_root,track_root_h",
                         [(True, True), (True, False), (False, True)])
def test_deepmimic_reward_golden(reference_root, track_root, track_root_h):
    torch = pytest.importorskip("torch")
    ref_util = _import_ref_util(reference_root)
    model = humanoid_spec().build()
    n = 32
    rng = np.random.default_rng(3)
    sim_np = _rand_state(model, rng, n)
    tar_np = _rand_state(model, rng, n)

    cfg = EnvConfig(num_envs=n, track_root=track_root,
                    track_root_h=track_root_h, use_contact_info=False)
    env = DeepMimicEnv(model, engine.SimParams(), cfg)
    state = _env_state(env, sim_np,
                       np.zeros((n, model.num_bodies, 3), np.float32),
                       np.full((n,), 0.5, np.float32),
                       np.full((n,), 0.5, np.float32), n)
    _, comps = env._compute_reward(state, _ref_frame(model, tar_np),
                                   jnp.asarray(tar_np["body_pos"]))

    kb = np.asarray(env.key_body_ids)
    t = lambda x: torch.tensor(np.asarray(x))
    ref_r = ref_util.compute_deepmimic_reward(
        t(sim_np["root_pos"]), t(sim_np["root_rot"]), t(sim_np["root_vel"]),
        t(sim_np["root_ang_vel"]), t(sim_np["joint_rot"]),
        t(sim_np["dof_vel"]), t(sim_np["body_pos"][:, kb]),
        t(tar_np["root_pos"]), t(tar_np["root_rot"]), t(tar_np["root_vel"]),
        t(tar_np["root_ang_vel"]), t(tar_np["joint_rot"]),
        t(tar_np["dof_vel"]), t(tar_np["body_pos"][:, kb]),
        t(env.joint_err_w), t(env.dof_err_w), track_root_h, track_root)

    np.testing.assert_allclose(np.asarray(comps[:, :5]), ref_r.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_contact_reward_golden(reference_root):
    torch = pytest.importorskip("torch")
    ref_util = _import_ref_util(reference_root)
    model = humanoid_spec().build()
    n = 32
    rng = np.random.default_rng(5)
    sim_np = _rand_state(model, rng, n)
    forces = (rng.normal(size=(n, model.num_bodies, 3)).astype(np.float32)
              * (rng.random((n, model.num_bodies, 1)) < 0.3))
    tar_contacts = (rng.random((n, model.num_bodies)) < 0.3).astype(
        np.float32)

    cfg = EnvConfig(num_envs=n, use_contact_info=True)
    env = DeepMimicEnv(model, engine.SimParams(), cfg)
    state = _env_state(env, sim_np, forces,
                       np.full((n,), 0.5, np.float32),
                       np.full((n,), 0.5, np.float32), n)
    _, comps = env._compute_reward(
        state, _ref_frame(model, sim_np, contacts=tar_contacts),
        jnp.asarray(sim_np["body_pos"]))

    t = lambda x: torch.tensor(np.asarray(x))
    ref_r = ref_util.compute_contact_reward(
        t(tar_contacts), t(forces), t(env.contact_weights))
    np.testing.assert_allclose(np.asarray(comps[:, 5]),
                               ref_r.mean(dim=-1).numpy(),
                               rtol=1e-4, atol=1e-6)


def test_done_golden(reference_root):
    """Fall-contact + pose + root termination and the FAIL-overrides-TIME
    precedence, on flat zero terrain (where the reference's absolute
    termination heights equal our terrain-relative ones)."""
    torch = pytest.importorskip("torch")
    ref_util = _import_ref_util(reference_root)
    model = humanoid_spec().build()
    n = 48
    rng = np.random.default_rng(11)
    sim_np = _rand_state(model, rng, n)
    # half the batch: near-reference pose (no pose fail)
    tar_np = {k: v.copy() for k, v in sim_np.items()}
    half = n // 2
    far = _rand_state(model, rng, n)
    for k in tar_np:
        tar_np[k][half:] = far[k][half:]
    # sparse contact forces on random bodies (some rows fall-contact)
    forces = (rng.normal(size=(n, model.num_bodies, 3)).astype(np.float32)
              * (rng.random((n, model.num_bodies, 1)) < 0.2))
    time = np.full((n,), 0.5, np.float32)
    time[::7] = 20.0   # timeout rows (episode_length 10), some also failing

    cfg = EnvConfig(num_envs=n, contact_bodies=("right_foot", "left_foot"))
    env = DeepMimicEnv(model, engine.SimParams(), cfg)
    lib = ml.build_motion_lib(model, [_flat_clip(n=3000)])  # 100 s clip
    state = _env_state(env, sim_np, forces, time,
                       np.full((n,), 0.5, np.float32), n)
    ours = env._compute_done(lib, state, _ref_frame(model, tar_np),
                             jnp.asarray(tar_np["body_pos"]))

    t = lambda x: torch.tensor(np.asarray(x))
    ref_done = ref_util.compute_done(
        torch.zeros(n, dtype=torch.long), t(time),
        float(cfg.episode_length), t(sim_np["root_rot"]),
        t(sim_np["body_pos"]), t(sim_np["root_pos"]),
        t(tar_np["root_rot"]), t(tar_np["body_pos"]), t(forces),
        torch.tensor(list(env.contact_body_ids), dtype=torch.long),
        torch.full((model.num_bodies,), cfg.termination_height),
        True, t(env.pose_term_dist), False, True, True,
        cfg.root_pos_termination_dist, cfg.root_rot_termination_angle)

    ours = np.asarray(ours)
    assert (ours == ref_done.numpy()).all(), \
        np.stack([ours, ref_done.numpy()])
    # the batch must actually exercise all three outcomes
    assert (ours == DoneFlags.FAIL).any()
    assert (ours == DoneFlags.TIME).any()
    assert (ours == DoneFlags.NULL).any()
    # ...including the precedence case: a timed-out row that also fails
    # must report FAIL (the reference assigns FAIL after TIME)
    assert (ours[(time >= cfg.episode_length)] == DoneFlags.FAIL).any()
