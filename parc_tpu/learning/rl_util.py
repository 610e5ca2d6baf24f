"""RL return computations.

TD(lambda) via a reverse ``lax.scan`` (reference implements the same
dynamic program with a Python loop, learning/rl_util.py:6-29; the
brute-force oracle from :31-77 is mirrored in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parc_tpu.envs.base import DoneFlags


def compute_td_lambda_return(r, next_vals, done, discount, td_lambda):
    """[T, B] rewards/values/dones -> [T, B] TD(lambda) targets.

    ``done != NULL`` cuts the recursion (the episode bootstraps through
    next_vals at that step).
    """
    reset = (done != DoneFlags.NULL).astype(r.dtype)
    last = r[-1] + discount * next_vals[-1]

    def body(carry, xs):
        next_ret = carry
        r_t, reset_t, next_v = xs
        lam = td_lambda * (1.0 - reset_t)
        val = r_t + discount * ((1.0 - lam) * next_v + lam * next_ret)
        return val, val

    xs = (r[:-1], reset[:-1], next_vals[:-1])
    _, rets = jax.lax.scan(body, last, xs, reverse=True)
    return jnp.concatenate([rets, last[None]], axis=0)
