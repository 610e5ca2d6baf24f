"""Diagonal Gaussian action distribution helpers (pure functions).

Reference parity: learning/distribution_gaussian_diag.py:5-103.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def sample(rng, mean, logstd):
    return mean + jnp.exp(logstd) * jax.random.normal(rng, mean.shape)


def mode(mean, logstd):
    del logstd
    return mean


def log_prob(mean, logstd, actions):
    var = jnp.exp(2.0 * logstd)
    return jnp.sum(-0.5 * ((actions - mean) ** 2 / var)
                   - logstd - 0.5 * _LOG_2PI, axis=-1)


def entropy(logstd):
    return jnp.sum(logstd + 0.5 * (_LOG_2PI + 1.0), axis=-1)


def kl(mean0, logstd0, mean1, logstd1):
    var0, var1 = jnp.exp(2 * logstd0), jnp.exp(2 * logstd1)
    return jnp.sum(logstd1 - logstd0
                   + (var0 + (mean0 - mean1) ** 2) / (2.0 * var1) - 0.5,
                   axis=-1)


# ---------------------------------------------------------------------------
# Categorical (reference: learning/distribution_categorical.py)
# ---------------------------------------------------------------------------


def categorical_sample(rng, logits):
    return jax.random.categorical(rng, logits, axis=-1)


def categorical_mode(logits):
    return jnp.argmax(logits, axis=-1)


def categorical_log_prob(logits, actions):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions[..., None],
                               axis=-1)[..., 0]


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def categorical_kl(logits0, logits1):
    lp0 = jax.nn.log_softmax(logits0, axis=-1)
    lp1 = jax.nn.log_softmax(logits1, axis=-1)
    return jnp.sum(jnp.exp(lp0) * (lp0 - lp1), axis=-1)
