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

The condition tokens (hf CNN + target + prev-state) are independent of
the diffusion timestep and of x_t, so samplers compute them ONCE via
``encode_conditions`` and pass ``cond_toks`` to every denoise step —
the analogue of the reference's ``fast_forward`` condition-token cache
(reference: diffusion/mdm_transformer.py fast_forward). XLA does not
hoist the CNN out of a ``lax.scan`` body on its own.

TPU notes: attention is over ~82 tokens — a single fused matmul regime;
everything is bf16-friendly dense compute on the MXU.

CHECKPOINT FORMAT NOTE: the setup()-based module names the flax param
tree (t_mlp/in_mlp/layers_N/pos_embed/...). Checkpoints saved by the
early @nn.compact variant (Dense_0/EncoderLayer_0 names, and two
independent input MLPs for prev-state vs frame tokens) do NOT restore
into this tree and are invalidated; the shared in_mlp matches the
reference's _in_mlp_gen_seq. No shipped artifact uses the old format.
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


class MLPStack(nn.Module):
    hidden: Tuple[int, ...]
    out: int

    @nn.compact
    def __call__(self, x):
        for w in self.hidden:
            x = nn.gelu(nn.Dense(w)(x))
        return nn.Dense(self.out)(x)


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

    # number of cacheable condition tokens: 64 hf + 1 target + prev states
    @property
    def num_cond_tokens(self) -> int:
        return 64 + 1 + self.num_prev_states

    def setup(self):
        d = self.d_model
        self.t_mlp = MLPStack((d,), d)
        self.hf_tokenizer = HeightfieldTokenizer(d_model=d)
        self.target_mlp = MLPStack(self.target_mlp_layers, d)
        self.in_mlp = MLPStack(self.in_mlp_layers, d)
        self.out_mlp = MLPStack(self.out_mlp_layers, self.frame_dim)
        self.prev_noise_ind = self.param(
            "prev_noise_ind", nn.initializers.normal(0.02),
            (2, self.d_model))
        num_tokens = 1 + self.num_cond_tokens + self.seq_len
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (num_tokens, self.d_model))
        self.layers = [
            EncoderLayer(self.d_model, self.num_heads, self.d_hid,
                         self.dropout, dtype=self.compute_dtype)
            for _ in range(self.num_layers)]

    def encode_conditions(self, prev_states, hf, target_dir,
                          hf_mask=None, target_mask=None,
                          prev_state_mask=None, prev_state_noised=None):
        """Condition tokens [hf (64) | target (1) | prev (num_prev)] —
        timestep/x_t-independent, so samplers hoist this out of the
        denoise scan (reference fast_forward cache)."""
        hf_toks = self.hf_tokenizer(hf)
        if hf_mask is not None:
            hf_toks = hf_toks * hf_mask[:, None, None]

        tgt_tok = self.target_mlp(target_dir)[:, None, :]
        if target_mask is not None:
            tgt_tok = tgt_tok * target_mask[:, None, None]

        prev_toks = self.in_mlp(prev_states)
        if prev_state_noised is not None:
            ind = jnp.where(prev_state_noised[:, None, None] > 0,
                            self.prev_noise_ind[1], self.prev_noise_ind[0])
            prev_toks = prev_toks + ind
        if prev_state_mask is not None:
            prev_toks = prev_toks * prev_state_mask[:, None, None]

        return jnp.concatenate([hf_toks, tgt_tok, prev_toks], axis=1)

    def __call__(self, x_t, t, prev_states=None, hf=None, target_dir=None,
                 hf_mask=None, target_mask=None, prev_state_mask=None,
                 prev_state_noised=None, deterministic=True,
                 cond_toks=None):
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
          cond_toks: optional (B, num_cond_tokens, d_model) precomputed
            ``encode_conditions`` output; when given, the raw condition
            inputs are ignored.
        Returns:
          (B, seq_len, frame_dim) predicted x0.
        """
        d = self.d_model
        if cond_toks is None:
            cond_toks = self.encode_conditions(
                prev_states, hf, target_dir, hf_mask, target_mask,
                prev_state_mask, prev_state_noised)

        # timestep token
        t_tok = self.t_mlp(timestep_embedding(t, d))[:, None, :]

        # motion frame tokens
        frame_toks = self.in_mlp(x_t)

        tokens = jnp.concatenate([t_tok, cond_toks, frame_toks], axis=1)

        # learned positional embedding over the fixed token layout
        pos = self.pos_embed
        if self.compute_dtype is not None:
            tokens = tokens.astype(self.compute_dtype)
            pos = pos.astype(self.compute_dtype)
        x = tokens + pos

        for layer in self.layers:
            x = layer(x, deterministic=deterministic)
        x = x.astype(jnp.float32)

        out = x[:, -self.seq_len:, :]
        return self.out_mlp(out)
