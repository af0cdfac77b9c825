"""AnimateDiff-style temporal motion module.

Reference: hallo/models/motion_module.py (VanillaTemporalModule /
TemporalTransformer3DModel / VersatileAttention). Attention runs over the
time axis per spatial location: (B*F, L, C) -> (B*L, F, C) with a sinusoidal
positional encoding added to the normed sequence (motion_module.py:579-607).
proj_out is zero-initialized so a freshly-added module is the identity
(motion_module.py:169-172).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import MotionModuleConfig
from hallo_tpu.models.layers import (
    TemporalSelfAttention,
    Dense,
    Dtype,
    FeedForward,
    GroupNorm,
    LayerNorm,
    fold_time,
    sinusoidal_positions,
    unfold_time,
)


class TemporalAttention(nn.Module):
    """Self-attention over frames per spatial site, with sinusoidal PE."""

    heads: int
    head_dim: int
    max_len: int = 32
    use_pe: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, frames: int) -> jax.Array:
        # x: (B*F, L, C) normed. View as (B, F, L, C) — contiguous, no copy —
        # and attend over F in place (see TemporalSelfAttention docstring for
        # why this beats the reference's (b d) f c rearrange on TPU).
        bf, l, c = x.shape
        b = bf // frames
        x = x.reshape(b, frames, l, c)
        if self.use_pe:
            pe = sinusoidal_positions(self.max_len, c)[:frames]
            x = x + pe[None, :, None, :].astype(x.dtype)
        out = TemporalSelfAttention(
            self.heads, self.head_dim, out_dim=c, dtype=self.dtype, name="attn"
        )(x)
        return out.reshape(bf, l, c)


class MotionModule(nn.Module):
    """GN -> proj_in -> N x (temporal attn x2 + FF) -> zero proj_out + residual."""

    config: MotionModuleConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, F, H, W, C) — F may include prepended motion frames.
        cfg = self.config
        b, f, h, w, c = x.shape
        heads = cfg.num_attention_heads
        head_dim = c // heads // cfg.temporal_attention_dim_div

        x2, _ = fold_time(x)
        residual = x2
        hs = GroupNorm(cfg.norm_num_groups, 1e-6, name="norm")(x2)
        hs = hs.reshape(b * f, h * w, c)
        hs = Dense(heads * head_dim, dtype=self.dtype, name="proj_in")(hs)

        for i in range(cfg.num_transformer_block):
            for j, block_type in enumerate(cfg.attention_block_types):
                assert block_type == "Temporal_Self", block_type
                normed = LayerNorm(dtype=self.dtype, name=f"blocks_{i}_norm_{j}")(hs)
                hs = hs + TemporalAttention(
                    heads,
                    head_dim,
                    max_len=cfg.temporal_position_encoding_max_len,
                    use_pe=cfg.temporal_position_encoding,
                    dtype=self.dtype,
                    name=f"blocks_{i}_attn_{j}",
                )(normed, f)
            hs = hs + FeedForward(hs.shape[-1], dtype=self.dtype, name=f"blocks_{i}_ff")(
                LayerNorm(dtype=self.dtype, name=f"blocks_{i}_ff_norm")(hs)
            )

        hs = Dense(c, dtype=self.dtype, zero_init=True, name="proj_out")(hs)
        hs = hs.reshape(b * f, h, w, c) + residual
        return unfold_time(hs, f)
