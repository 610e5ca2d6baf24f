"""Rotation algebra tests, including golden parity vs the torch reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.utils import rotation as rot


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_mul_rotate_consistency():
    q1 = jnp.asarray(_rand_quats(64, 1))
    q2 = jnp.asarray(_rand_quats(64, 2))
    v = jnp.asarray(np.random.default_rng(3).normal(size=(64, 3)).astype(np.float32))
    lhs = rot.quat_rotate(rot.quat_mul(q1, q2), v)
    rhs = rot.quat_rotate(q1, rot.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_exp_map_round_trip():
    q = jnp.asarray(_rand_quats(128, 4))
    em = rot.quat_to_exp_map(q)
    q2 = rot.exp_map_to_quat(em)
    # same rotation up to sign
    dots = jnp.abs(jnp.sum(rot.quat_normalize(q) * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_matrix_round_trip():
    q = jnp.asarray(_rand_quats(128, 5))
    m = rot.quat_to_matrix(q)
    q2 = rot.matrix_to_quat(m)
    dots = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_tan_norm_round_trip():
    q = jnp.asarray(_rand_quats(64, 6))
    tn = rot.quat_to_tan_norm(q)
    q2 = rot.tan_norm_to_quat(tn)
    dots = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_slerp_endpoints_and_identity():
    q0 = jnp.asarray(_rand_quats(32, 7))
    q1 = jnp.asarray(_rand_quats(32, 8))
    s0 = rot.slerp(q0, q1, jnp.zeros((32,)))
    s1 = rot.slerp(q0, q1, jnp.ones((32,)))
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(s0) * np.asarray(q0), -1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(s1) * np.asarray(q1), -1)), 1.0, atol=1e-4)


def test_grad_safety_at_identity():
    """Gradients through exp-map/axis-angle at identity must be finite."""
    def f(em):
        return jnp.sum(rot.quat_to_exp_map(rot.exp_map_to_quat(em)) ** 2)

    g = jax.grad(f)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))

    def h(q_xyz):
        q = jnp.concatenate([q_xyz, jnp.ones(1)], axis=-1)
        q = rot.quat_normalize(q)
        return rot.quat_diff_angle(q, q) ** 2

    g2 = jax.grad(h)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_heading():
    yaw = jnp.asarray([0.3, -1.2, 2.5], dtype=jnp.float32)
    q = rot.heading_to_quat(yaw)
    np.testing.assert_allclose(rot.calc_heading(q), yaw, atol=1e-5)
    qinv = rot.calc_heading_quat_inv(q)
    np.testing.assert_allclose(
        rot.calc_heading(rot.quat_mul(qinv, q)), np.zeros(3), atol=1e-5
    )


@pytest.mark.parametrize("fn_pair", [
    "quat_mul", "quat_rotate", "quat_to_exp_map", "exp_map_to_quat",
    "quat_to_tan_norm", "calc_heading", "quat_diff", "quat_diff_angle",
    "slerp", "quat_to_matrix", "calc_heading_quat_inv",
])
def test_golden_vs_reference(reference_root, fn_pair):
    """Bitwise-level parity against the reference torch implementation."""
    torch = pytest.importorskip("torch")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_torch_util", str(reference_root / "util" / "torch_util.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    q0 = _rand_quats(64, 10)
    q1 = _rand_quats(64, 11)
    v = np.random.default_rng(12).normal(size=(64, 3)).astype(np.float32)
    t = np.random.default_rng(13).uniform(size=(64,)).astype(np.float32)
    em = (0.5 * v).astype(np.float32)

    tq0, tq1 = torch.from_numpy(q0), torch.from_numpy(q1)
    tv, tt, tem = torch.from_numpy(v), torch.from_numpy(t), torch.from_numpy(em)
    jq0, jq1 = jnp.asarray(q0), jnp.asarray(q1)
    jv, jt, jem = jnp.asarray(v), jnp.asarray(t), jnp.asarray(em)

    if fn_pair == "quat_mul":
        a, b = ref.quat_mul(tq0, tq1).numpy(), rot.quat_mul(jq0, jq1)
    elif fn_pair == "quat_rotate":
        a, b = ref.quat_rotate(tq0, tv).numpy(), rot.quat_rotate(jq0, jv)
    elif fn_pair == "quat_to_exp_map":
        a, b = ref.quat_to_exp_map(tq0).numpy(), rot.quat_to_exp_map(jq0)
    elif fn_pair == "exp_map_to_quat":
        a, b = ref.exp_map_to_quat(tem).numpy(), rot.exp_map_to_quat(jem)
    elif fn_pair == "quat_to_tan_norm":
        a, b = ref.quat_to_tan_norm(tq0).numpy(), rot.quat_to_tan_norm(jq0)
    elif fn_pair == "calc_heading":
        a, b = ref.calc_heading(tq0).numpy(), rot.calc_heading(jq0)
    elif fn_pair == "quat_diff":
        # world-frame relative rotation q1 * q0^-1 — finite-difference
        # angular velocities must live in the same frame as the sim's
        # world-frame root_ang_vel
        a, b = ref.quat_diff(tq0, tq1).numpy(), rot.quat_diff(jq0, jq1)
    elif fn_pair == "quat_diff_angle":
        a = np.abs(ref.quat_diff_angle(tq0, tq1).numpy())
        b = rot.quat_diff_angle(jq0, jq1)
    elif fn_pair == "slerp":
        a, b = ref.slerp(tq0, tq1, tt).numpy(), rot.slerp(jq0, jq1, jt)
    elif fn_pair == "quat_to_matrix":
        a, b = ref.quat_to_matrix(tq0).numpy(), rot.quat_to_matrix(jq0)
    elif fn_pair == "calc_heading_quat_inv":
        a, b = ref.calc_heading_quat_inv(tq0).numpy(), rot.calc_heading_quat_inv(jq0)
    else:
        raise AssertionError(fn_pair)

    np.testing.assert_allclose(np.asarray(b), a, atol=2e-5)
