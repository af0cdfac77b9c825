"""Per-resolution attention stages (reference Transformer3DModel /
Transformer2DModel wrappers, hallo/models/transformer_3d.py:38-257,
transformer_2d.py:66-431).

GN -> proj (1x1) -> transformer block(s) -> proj (1x1) + residual, with frames
folded into batch. 1x1 convs are expressed as token-wise Dense layers
(identical math, MXU-friendly, converter squeezes the conv kernels).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.models.attention_blocks import (
    AudioTransformerBlock,
    BasicTransformerBlock,
    SpatialTransformerBlock,
)
from hallo_tpu.models.layers import Dense, Dtype, GroupNorm, fold_time, unfold_time


class SpatialTransformer(nn.Module):
    """Spatial self+cross attention stage of the denoising UNet (read-side)."""

    heads: int
    head_dim: int
    num_layers: int = 1
    norm_num_groups: int = 32
    upcast_attention: bool = False
    cfg_split: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        ref_feature: Optional[jax.Array],
        context: jax.Array,
        uncond_mask: Optional[jax.Array] = None,
        ref_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        b, f, h, w, c = x.shape
        inner = self.heads * self.head_dim
        x2, _ = fold_time(x)
        residual = x2
        hs = GroupNorm(self.norm_num_groups, 1e-6, name="norm")(x2)
        hs = hs.reshape(b * f, h * w, c)
        hs = Dense(inner, dtype=self.dtype, name="proj_in")(hs)
        # spatial_ref_kv projects with blocks_0's to_k/to_v; with >1 inner
        # blocks (never the case for SD-1.5) later blocks have their own
        # weights, so fall back to the concat-then-project path there.
        for i in range(self.num_layers):
            hs = SpatialTransformerBlock(
                self.heads,
                self.head_dim,
                upcast_attention=self.upcast_attention,
                cfg_split=self.cfg_split,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(hs, ref_feature, context, f, uncond_mask,
              ref_kv if i == 0 else None)
        hs = Dense(c, dtype=self.dtype, name="proj_out")(hs)
        hs = hs.reshape(b * f, h, w, c) + residual
        return unfold_time(hs, f)


class ReferenceTransformer(nn.Module):
    """Spatial attention stage of the 2D ReferenceNet (write-side): also
    returns the per-block normed hidden states ("ref features")."""

    heads: int
    head_dim: int
    num_layers: int = 1
    norm_num_groups: int = 32
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: jax.Array
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        b, h, w, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        hs = GroupNorm(self.norm_num_groups, 1e-6, name="norm")(x)
        hs = hs.reshape(b, h * w, c)
        hs = Dense(inner, dtype=self.dtype, name="proj_in")(hs)
        ref_features = []
        for i in range(self.num_layers):
            hs, ref = BasicTransformerBlock(
                self.heads,
                self.head_dim,
                upcast_attention=self.upcast_attention,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(hs, context)
            ref_features.append(ref)
        hs = Dense(c, dtype=self.dtype, name="proj_out")(hs)
        hs = hs.reshape(b, h, w, c) + residual
        return hs, tuple(ref_features)


class AudioTransformer(nn.Module):
    """Hierarchical audio cross-attention stage.

    `inner_dim` reproduces the reference's construction quirk where the head
    dim derives from the block's *input* channels while the feature map has
    the block's output channels (unet_3d_blocks.py:585-605 "TODO:检查维度"):
    proj_in maps C -> inner_dim and proj_out maps back.
    """

    heads: int
    inner_dim: int
    hierarchical: bool = True
    num_layers: int = 1
    norm_num_groups: int = 32
    upcast_attention: bool = False
    cfg_split: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        audio_context: jax.Array,
        full_mask: Optional[jax.Array] = None,
        face_mask: Optional[jax.Array] = None,
        lip_mask: Optional[jax.Array] = None,
        motion_scale: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, f, h, w, c = x.shape
        # audio_context: (B, F, T, Da) -> (B*F, T, Da)
        audio = audio_context.reshape(
            b * f, audio_context.shape[2], audio_context.shape[3]
        )
        x2, _ = fold_time(x)
        residual = x2
        hs = GroupNorm(self.norm_num_groups, 1e-6, name="norm")(x2)
        hs = hs.reshape(b * f, h * w, c)
        hs = Dense(self.inner_dim, dtype=self.dtype, name="proj_in")(hs)
        for i in range(self.num_layers):
            hs = AudioTransformerBlock(
                self.heads,
                self.inner_dim // self.heads,
                hierarchical=self.hierarchical,
                upcast_attention=self.upcast_attention,
                cfg_split=self.cfg_split,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(hs, audio, full_mask, face_mask, lip_mask, motion_scale)
        hs = Dense(c, dtype=self.dtype, name="proj_out")(hs)
        hs = hs.reshape(b * f, h, w, c) + residual
        return unfold_time(hs, f)
