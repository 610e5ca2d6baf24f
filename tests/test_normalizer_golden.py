"""Golden parity of the running normalizer vs the reference's Normalizer
(learning/normalizer.py, pure torch; imported, not copied)."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.learning import normalizer as norm_lib


def test_normalizer_golden_vs_reference(reference_root):
    torch = pytest.importorskip("torch")
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    from learning import normalizer as ref_norm

    d = 16
    non_norm = [3, 7, 8]
    rng = np.random.default_rng(0)

    # the reference trains with the default clip=inf
    # (learning/base_agent.py:191); at finite clip the implementations
    # deliberately differ - ours exempts non-normalized segments from the
    # clip, the reference clips them at their raw value
    ref = ref_norm.Normalizer(
        (d,), device="cpu",
        non_norm_indices=torch.tensor(non_norm, dtype=torch.long))
    mask = np.ones(d, np.float32)
    mask[non_norm] = 0.0
    ours = norm_lib.create(d, norm_mask=mask, clip=float("inf"))

    for _ in range(5):
        batch = (rng.normal(2.0, 3.0, (64, d)) * rng.uniform(0.5, 2.0, d)
                 ).astype(np.float32)
        ref.record(torch.tensor(batch))
        ref.update()
        ours = norm_lib.update(ours, jnp.asarray(batch))

    np.testing.assert_allclose(np.asarray(ours.mean)[mask > 0],
                               ref.get_mean().numpy()[mask > 0],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.sqrt(np.asarray(ours.var))[mask > 0],
                               ref.get_std().numpy()[mask > 0],
                               atol=1e-3, rtol=1e-3)

    x = rng.normal(2.0, 6.0, (32, d)).astype(np.float32)  # exercises clip
    ref_y = ref.normalize(torch.tensor(x)).numpy()
    ours_y = np.asarray(norm_lib.normalize(ours, jnp.asarray(x)))
    np.testing.assert_allclose(ours_y, ref_y, atol=1e-3, rtol=1e-3)
