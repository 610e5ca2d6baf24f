"""Terrain-conditioned motion diffusion denoiser (flax.linen).

Token layout mirrors the reference MDMTransformer (reference:
diffusion/mdm_transformer.py:5-247):

  [ timestep-embed | 64 heightfield CNN tokens | target token |
    prev-state tokens (2) | motion-frame tokens (15) ]

A transformer *encoder* (full self-attention, 6 layers, d_model 1024,
16 heads) denoises the motion-frame tokens; condition dropout masks the
heightfield / target / prev-state tokens for classifier-free guidance.
The heightfield tokenizer follows cnn_31xy_4layer_c64_out64 (reference:
learning/nets/cnn_31xy_4layer_c64_out64.py:5-37): conv stack to an 8x8
grid of 256-d patch tokens.

TPU notes: attention is over ~82 tokens — a single fused matmul regime;
everything is bf16-friendly dense compute on the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from parc_tpu.diffusion.schedules import timestep_embedding


class HeightfieldTokenizer(nn.Module):
    """31x31 local heightfield -> 64 tokens of d_model."""

    d_model: int = 1024

    @nn.compact
    def __call__(self, hf):  # (..., 31, 31)
        x = hf[..., None]
        x = nn.Conv(32, (5, 5), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(64, (5, 5), strides=(2, 2), padding="SAME")(x)  # 16x16
        x = nn.gelu(x)
        x = nn.Conv(64, (5, 5), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(64, (4, 4), strides=(2, 2), padding="SAME")(x)  # 8x8
        x = x.reshape(x.shape[:-3] + (64, 64))
        return nn.Dense(self.d_model)(x)  # (..., 64, d_model)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_hid: int
    dropout: float = 0.1
    dtype: object = None      # bf16 compute on TPU; params stay f32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout)(
                x, x, mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype)(x + h)
        h = nn.Dense(self.d_hid, dtype=self.dtype)(x)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        x = nn.LayerNorm(dtype=self.dtype)(x + h)
        return x


class MDMTransformer(nn.Module):
    frame_dim: int                  # e.g. 91
    seq_len: int = 15
    num_prev_states: int = 2
    d_model: int = 1024
    num_heads: int = 16
    d_hid: int = 1024
    num_layers: int = 6
    dropout: float = 0.1
    target_dim: int = 2             # xy direction
    in_mlp_layers: Tuple[int, ...] = (1024,)
    out_mlp_layers: Tuple[int, ...] = (1024,)
    target_mlp_layers: Tuple[int, ...] = (512,)
    # mixed precision: encoder matmuls in bf16, params/outputs f32
    # (the MDM losses and diffusion math stay f32)
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x_t, t, prev_states, hf, target_dir,
                 hf_mask=None, target_mask=None, prev_state_mask=None,
                 prev_state_noised=None, deterministic=True):
        """Denoise motion tokens.

        Args:
          x_t: (B, seq_len, frame_dim) noised motion frames.
          t: (B,) diffusion timesteps.
          prev_states: (B, num_prev, frame_dim) conditioning frames.
          hf: (B, 31, 31) local heightfield.
          target_dir: (B, target_dim).
          *_mask: (B,) 1.0 keeps the condition, 0.0 drops it (CFG).
          prev_state_noised: (B,) 1.0 flags noisy prev-state conditioning
            (reference: prev-state-noise-indicator embedding).
        Returns:
          (B, seq_len, frame_dim) predicted x0.
        """
        b = x_t.shape[0]
        d = self.d_model

        def mlp(layers, out, x):
            for w in layers:
                x = nn.gelu(nn.Dense(w)(x))
            return nn.Dense(out)(x)

        # timestep token
        t_tok = mlp((d,), d, timestep_embedding(t, d))[:, None, :]

        # heightfield tokens
        hf_toks = HeightfieldTokenizer(d_model=d)(hf)
        if hf_mask is not None:
            hf_toks = hf_toks * hf_mask[:, None, None]

        # target token
        tgt_tok = mlp(self.target_mlp_layers, d, target_dir)[:, None, :]
        if target_mask is not None:
            tgt_tok = tgt_tok * target_mask[:, None, None]

        # prev-state tokens, with a learned noise-indicator embedding
        prev_toks = mlp(self.in_mlp_layers, d, prev_states)
        noise_ind = self.param("prev_noise_ind", nn.initializers.normal(0.02),
                               (2, d))
        if prev_state_noised is not None:
            ind = jnp.where(prev_state_noised[:, None, None] > 0,
                            noise_ind[1], noise_ind[0])
            prev_toks = prev_toks + ind
        if prev_state_mask is not None:
            prev_toks = prev_toks * prev_state_mask[:, None, None]

        # motion frame tokens
        frame_toks = mlp(self.in_mlp_layers, d, x_t)

        tokens = jnp.concatenate(
            [t_tok, hf_toks, tgt_tok, prev_toks, frame_toks], axis=1)

        # learned positional embedding over the fixed token layout
        num_tokens = tokens.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (num_tokens, d))
        if self.compute_dtype is not None:
            tokens = tokens.astype(self.compute_dtype)
            pos = pos.astype(self.compute_dtype)
        x = tokens + pos

        for _ in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.num_heads, self.d_hid,
                             self.dropout, dtype=self.compute_dtype)(
                x, deterministic=deterministic)
        x = x.astype(jnp.float32)

        out = x[:, -self.seq_len:, :]
        return mlp(self.out_mlp_layers, self.frame_dim, out)
