"""Vision-augmented tracker policies: CNN-MLP and ViT variants.

The flat observation carries a heightfield segment (the ray cone, reshaped
to its (rays, samples) 2-D layout); these networks process it with a conv
tokenizer and fuse with the proprioceptive segments.

Reference parity: learning/nets/dm_cnn_mlp.py:31-95 (conv + MLP fusion),
learning/nets/dm_vit.py:30-175 (transformer encoder over obs tokens + hf
CNN tokens), learning/nets/cnn_tokenizer.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from parc_tpu.envs.obs import ObsLayout


class RayConvTokenizer(nn.Module):
    """(num_rays, samples) heightfield rays -> tokens."""

    hf_shape: Tuple[int, int]      # e.g. (7, 63): rays x samples
    d_out: int = 256
    dtype: object = None           # bf16 compute (params stay f32)

    @nn.compact
    def __call__(self, hf_flat):
        x = hf_flat.reshape(hf_flat.shape[:-1] + self.hf_shape + (1,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 5), padding="SAME", dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Conv(64, (3, 5), strides=(1, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Conv(64, (3, 5), strides=(1, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.gelu(x)
        # tokens = positions along the ray dimension
        tokens = x.reshape(x.shape[:-3] + (-1, x.shape[-1]))
        return nn.Dense(self.d_out, dtype=self.dtype)(tokens)


class DMCnnMlp(nn.Module):
    """Conv over the hf segment, MLP over the rest, fused MLP trunk."""

    action_dim: int
    layout: ObsLayout
    hf_shape: Tuple[int, int]
    mlp_layers: Sequence[int] = (1024, 1024, 512)
    action_std: float = 0.05
    actor_init_output_scale: float = 0.01
    dtype: object = None           # trunk compute dtype; heads stay f32

    def _split(self, obs):
        s = self.layout.slices()
        hf = obs[..., s["hf_obs"]]
        rest = jnp.concatenate(
            [obs[..., sl] for name, sl in s.items() if name != "hf_obs"],
            axis=-1)
        return hf, rest

    @nn.compact
    def __call__(self, obs):
        hf, rest = self._split(obs)
        hf_feat = RayConvTokenizer(self.hf_shape, d_out=128,
                                   dtype=self.dtype)(hf)
        hf_feat = hf_feat.reshape(hf_feat.shape[:-2] + (-1,))
        x = jnp.concatenate([rest.astype(hf_feat.dtype), hf_feat], axis=-1)
        for w in self.mlp_layers:
            x = nn.relu(nn.Dense(w, dtype=self.dtype)(x))
        x = x.astype(jnp.float32)
        init = nn.initializers.variance_scaling(
            self.actor_init_output_scale, "fan_avg", "uniform")
        mean = nn.Dense(self.action_dim, kernel_init=init)(x)
        logstd = jnp.full_like(mean, jnp.log(self.action_std))
        value = nn.Dense(1)(x)[..., 0]
        return mean, logstd, value

    def actor(self, obs):
        mean, logstd, _ = self(obs)
        return mean, logstd

    def critic(self, obs):
        return self(obs)[2]


class DMViT(nn.Module):
    """Transformer policy: proprio/tar segments become tokens alongside hf
    conv tokens; an encoder mixes them and heads read the first token."""

    action_dim: int
    layout: ObsLayout
    hf_shape: Tuple[int, int]
    d_model: int = 256
    num_heads: int = 8
    num_layers: int = 3
    action_std: float = 0.05
    actor_init_output_scale: float = 0.01
    dtype: object = None           # encoder compute dtype; heads stay f32

    @nn.compact
    def __call__(self, obs):
        s = self.layout.slices()
        hf = obs[..., s["hf_obs"]]
        hf_tokens = RayConvTokenizer(self.hf_shape, d_out=self.d_model,
                                     dtype=self.dtype)(hf)

        seg_tokens = []
        for name, sl in s.items():
            if name == "hf_obs":
                continue
            seg_tokens.append(
                nn.Dense(self.d_model, dtype=self.dtype)(
                    obs[..., sl].astype(self.dtype)
                    if self.dtype is not None else obs[..., sl]))
        toks = jnp.stack(seg_tokens, axis=-2)
        cls = self.param("cls", nn.initializers.normal(0.02),
                         (1, self.d_model))
        cls = jnp.broadcast_to(cls, toks.shape[:-2] + (1, self.d_model))
        x = jnp.concatenate([cls.astype(toks.dtype), toks, hf_tokens],
                            axis=-2)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (x.shape[-2], self.d_model))
        x = x + pos.astype(x.dtype)
        for _ in range(self.num_layers):
            h = nn.MultiHeadDotProductAttention(num_heads=self.num_heads,
                                                dtype=self.dtype)(x, x)
            x = nn.LayerNorm(dtype=self.dtype)(x + h)
            h = nn.Dense(4 * self.d_model, dtype=self.dtype)(x)
            h = nn.gelu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype)(h)
            x = nn.LayerNorm(dtype=self.dtype)(x + h)
        feat = x[..., 0, :].astype(jnp.float32)
        init = nn.initializers.variance_scaling(
            self.actor_init_output_scale, "fan_avg", "uniform")
        mean = nn.Dense(self.action_dim, kernel_init=init)(feat)
        logstd = jnp.full_like(mean, jnp.log(self.action_std))
        value = nn.Dense(1)(feat)[..., 0]
        return mean, logstd, value

    def actor(self, obs):
        mean, logstd, _ = self(obs)
        return mean, logstd

    def critic(self, obs):
        return self(obs)[2]
