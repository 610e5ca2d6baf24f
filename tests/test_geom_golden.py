"""Golden OBB-OBB separating-axis parity vs the reference geom_util."""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.utils import geom
from parc_tpu.utils import rotation as rot


def test_obb_obb_golden_vs_reference(reference_root):
    torch = pytest.importorskip("torch")
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from util import geom_util as ref_gu

    rng = np.random.default_rng(0)
    n = 512
    pos_a = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    pos_b = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    dims_a = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    dims_b = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)

    def rand_q(seed):
        r = np.random.default_rng(seed)
        q = r.normal(size=(n, 4)).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    quat_a, quat_b = rand_q(1), rand_q(2)

    separated, _, _ = ref_gu.obb_obb(
        torch.tensor(pos_a), torch.tensor(dims_a), torch.tensor(quat_a),
        torch.tensor(pos_b), torch.tensor(dims_b), torch.tensor(quat_b))
    ref = ~separated
    ours = np.asarray(geom.obb_obb_intersect(
        jnp.asarray(pos_a), jnp.asarray(dims_a), jnp.asarray(quat_a),
        jnp.asarray(pos_b), jnp.asarray(dims_b), jnp.asarray(quat_b)))
    ref_np = ref.numpy().astype(bool).reshape(-1)
    # both must contain a healthy mix
    assert 0.05 < ours.mean() < 0.95
    np.testing.assert_array_equal(ours, ref_np)
