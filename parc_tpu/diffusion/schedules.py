"""Diffusion schedules and embeddings.

Reference parity: diffusion/diffusion_util.py:72-248 — cosine beta schedule
over 1001 steps, posterior coefficients for predict-x0 DDPM, sinusoidal
timestep embeddings.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DiffusionRates:
    betas: jax.Array
    alphas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    posterior_mean_x0_coef: jax.Array
    posterior_mean_xt_coef: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def cosine_beta_schedule(timesteps: int, s: float = 0.008):
    import numpy as np
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0.0001, 0.9999)


def make_rates(timesteps: int = 1001) -> DiffusionRates:
    """Rates are host numpy on purpose: they are closed-over constants of
    jitted train/sample steps (device constants would be re-fetched from
    the accelerator during lowering)."""
    import numpy as np
    betas = cosine_beta_schedule(timesteps).astype(np.float32)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([np.ones((1,), np.float32), ac[:-1]])
    posterior_variance = betas * (1.0 - ac_prev) / (1.0 - ac)
    f32 = lambda x: np.asarray(x, np.float32)
    return DiffusionRates(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
        posterior_mean_x0_coef=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
        posterior_mean_xt_coef=f32((1.0 - ac_prev) * np.sqrt(alphas)
                                   / (1.0 - ac)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))),
    )


def gather(table, t: jax.Array) -> jax.Array:
    """Tracer-safe gather from a (possibly host-numpy) coefficient table."""
    return jnp.asarray(table)[t]


def forward_diffusion(rates: DiffusionRates, x0: jax.Array, t: jax.Array,
                      noise: jax.Array) -> jax.Array:
    """q(x_t | x_0): scale and noise. t broadcasts over batch dims."""
    a = gather(rates.sqrt_alphas_cumprod, t)
    b = gather(rates.sqrt_one_minus_alphas_cumprod, t)
    shape = t.shape + (1,) * (x0.ndim - t.ndim)
    return a.reshape(shape) * x0 + b.reshape(shape) * noise


def timestep_embedding(t: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
