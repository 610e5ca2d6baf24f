"""Golden parity for the observation kernels vs the reference's jitted
torch kernels (envs/ig_char_env.py:583-626 compute_char_obs,
envs/ig_parkour/mgdm_dm_util.py:462-519 compute_tar_obs).

Policy checkpoint portability and the reward-parity north star both rest
on the observation layout and heading-local conversions matching exactly.
"""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.anim import char_model as cm
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.envs import obs as obs_mod


def _import_ref(reference_root):
    for name in ("gym", "trimesh", "isaacgym", "isaacgym.gymapi",
                 "isaacgym.gymtorch", "isaacgym.gymutil"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    import envs.ig_char_env as ref_char_env
    from envs.ig_parkour import mgdm_dm_util as ref_util
    return ref_char_env, ref_util


def _rand_quats(rng, shape):
    q = rng.normal(size=shape + (4,))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("global_obs,root_height_obs",
                         [(False, True), (True, True), (False, False)])
def test_char_obs_golden(reference_root, global_obs, root_height_obs):
    torch = pytest.importorskip("torch")
    ref_char_env, _ = _import_ref(reference_root)
    model = humanoid_spec().build()
    n, rng = 32, np.random.default_rng(2)
    root_pos = rng.normal(size=(n, 3)).astype(np.float32)
    root_rot = _rand_quats(rng, (n,))
    root_vel = rng.normal(size=(n, 3)).astype(np.float32)
    root_ang_vel = rng.normal(size=(n, 3)).astype(np.float32)
    joint_rot = _rand_quats(rng, (n, model.num_bodies - 1))
    dof_vel = rng.normal(size=(n, model.dof_size)).astype(np.float32)
    body_pos, _ = cm.forward_kinematics(
        model, jnp.asarray(root_pos), jnp.asarray(root_rot),
        jnp.asarray(joint_rot))
    kb = np.asarray([2, 5, 8, 11])  # arbitrary key bodies
    key_pos = np.asarray(body_pos)[:, kb]

    ours = obs_mod.compute_char_obs(
        jnp.asarray(root_pos), jnp.asarray(root_rot), jnp.asarray(root_vel),
        jnp.asarray(root_ang_vel), jnp.asarray(joint_rot),
        jnp.asarray(dof_vel), jnp.asarray(key_pos), global_obs,
        root_height_obs)

    t = lambda x: torch.tensor(np.asarray(x))
    ref = ref_char_env.compute_char_obs(
        t(root_pos), t(root_rot), t(root_vel), t(root_ang_vel),
        t(joint_rot), t(dof_vel), t(key_pos), global_obs, root_height_obs)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("global_obs", [False, True])
def test_tar_obs_golden(reference_root, global_obs):
    torch = pytest.importorskip("torch")
    _, ref_util = _import_ref(reference_root)
    model = humanoid_spec().build()
    n, s, rng = 16, 6, np.random.default_rng(4)
    ref_root_pos = rng.normal(size=(n, 3)).astype(np.float32)
    ref_root_rot = _rand_quats(rng, (n,))
    tar_root_pos = rng.normal(size=(n, s, 3)).astype(np.float32)
    tar_root_rot = _rand_quats(rng, (n, s))
    tar_joint_rot = _rand_quats(rng, (n, s, model.num_bodies - 1))
    kb = np.asarray([2, 5, 8, 11])
    body_pos, _ = cm.forward_kinematics(
        model, jnp.asarray(tar_root_pos), jnp.asarray(tar_root_rot),
        jnp.asarray(tar_joint_rot))
    tar_key_pos = np.asarray(body_pos)[..., kb, :]

    ours = obs_mod.compute_tar_obs(
        jnp.asarray(ref_root_pos), jnp.asarray(ref_root_rot),
        jnp.asarray(tar_root_pos), jnp.asarray(tar_root_rot),
        jnp.asarray(tar_joint_rot), jnp.asarray(tar_key_pos), global_obs)

    t = lambda x: torch.tensor(np.asarray(x))
    ref = ref_util.compute_tar_obs(
        t(ref_root_pos), t(ref_root_rot), t(tar_root_pos), t(tar_root_rot),
        t(tar_joint_rot), t(tar_key_pos), global_obs, False)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().reshape(n, -1),
                               rtol=1e-4, atol=1e-5)
