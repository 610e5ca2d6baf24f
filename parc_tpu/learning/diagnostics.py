"""Network-health diagnostics: dormant units, stable rank, weight stats.

Reference parity: learning/dm_ppo_agent.py:607-773 (test_model2) — per-layer
stable rank of weight matrices (smallest k singular values covering 99% of
the spectral mass), average weight magnitude, and dormant-unit counts from
activation statistics over evaluation rollouts. Used to monitor plasticity
loss during long PARC iterations.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp


def stable_rank(weight: np.ndarray, mass: float = 0.99) -> int:
    """Smallest k such that the top-k singular values hold ``mass`` of the
    total singular-value sum (reference: dm_ppo_agent.py:634-652)."""
    s = np.linalg.svd(np.asarray(weight, np.float64), compute_uv=False)
    total = s.sum()
    if total <= 0:
        return 0
    frac = np.cumsum(s) / total
    return int(np.searchsorted(frac, mass) + 1)


def weight_diagnostics(params: Any) -> Dict[str, Dict[str, float]]:
    """Stable rank + mean |w| for every Dense kernel in a param pytree."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        if names[-1] != "kernel":
            continue
        w = np.asarray(leaf)
        if w.ndim != 2:
            continue
        name = "/".join(str(n) for n in names[:-1])
        out[name] = {
            "stable_rank": stable_rank(w),
            "max_rank": int(min(w.shape)),
            "mean_abs_weight": float(np.mean(np.abs(w))),
        }
    return out


def activation_diagnostics(net, params, obs: jax.Array,
                           dormant_threshold: float = 0.025
                           ) -> Dict[str, Dict[str, float]]:
    """Dormant-unit fractions from one batch of observations.

    A unit is dormant when its mean |activation| over the batch is below
    ``dormant_threshold`` x the layer's mean |activation| (the normalized
    criterion from "The Dormant Neuron Phenomenon in Deep RL"; the
    reference tracks the same EMA utility signal in test_model2).
    """
    _, state = net.apply(params, obs, capture_intermediates=True,
                         mutable=["intermediates"])
    inter = state["intermediates"]
    out = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if k == "__call__":
                for act in v:
                    if not isinstance(act, jnp.ndarray) or act.ndim < 1:
                        continue
                    a = jnp.abs(act).mean(axis=tuple(range(act.ndim - 1)))
                    denom = jnp.maximum(a.mean(), 1e-12)
                    frac = float(jnp.mean(a / denom < dormant_threshold))
                    out[prefix or "net"] = {
                        "dormant_frac": frac,
                        "num_units": int(a.shape[-1]),
                        "mean_abs_act": float(a.mean()),
                    }
            elif isinstance(v, dict):
                walk(v, f"{prefix}/{k}" if prefix else k)

    walk(inter, "")
    return out


def full_report(agent, state, obs: jax.Array) -> Dict[str, Any]:
    """Weight + activation diagnostics for a PPO agent state
    (the TPU equivalent of `run.py mode=test2`)."""
    from parc_tpu.learning import normalizer as norm_lib
    norm_obs = norm_lib.normalize(state.obs_norm, obs)
    return {
        "weights": weight_diagnostics(state.params),
        "activations": activation_diagnostics(agent.net, state.params,
                                              norm_obs),
    }
