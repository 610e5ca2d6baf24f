"""Golden TD(lambda) parity vs the reference's rl_util (imported)."""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from parc_tpu.learning import rl_util


def test_td_lambda_golden_vs_reference(reference_root):
    torch = pytest.importorskip("torch")
    if "gym" not in sys.modules:
        try:
            import gym  # noqa: F401
        except ImportError:
            sys.modules["gym"] = types.ModuleType("gym")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from learning import rl_util as ref_rl

    rng = np.random.default_rng(0)
    t_len, b = 24, 16
    r = rng.normal(0.5, 0.3, (t_len, b)).astype(np.float32)
    next_vals = rng.normal(0.0, 1.0, (t_len, b)).astype(np.float32)
    # mix of NULL/FAIL/SUCC/TIME resets mid-rollout
    done = rng.choice([0, 0, 0, 0, 1, 2, 3], size=(t_len, b)).astype(np.int64)

    ref = ref_rl.compute_td_lambda_return(
        torch.tensor(r), torch.tensor(next_vals), torch.tensor(done),
        0.99, 0.95).numpy()
    ours = np.asarray(rl_util.compute_td_lambda_return(
        jnp.asarray(r), jnp.asarray(next_vals), jnp.asarray(done),
        0.99, 0.95))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
