"""Identity / audio projection heads.

Reference: hallo/models/image_proj.py:23-76 (ArcFace 512-d -> 4 identity
context tokens) and hallo/models/audio_proj.py:40-124 (5-frame window of 12
wav2vec2 layer states -> 32 audio context tokens per frame).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import AudioProjConfig, ImageProjConfig
from hallo_tpu.models.layers import Dense, Dtype, LayerNorm


class ImageProj(nn.Module):
    config: ImageProjConfig = ImageProjConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        """(B, clip_embeddings_dim) -> (B, tokens, cross_attention_dim)."""
        cfg = self.config
        x = Dense(
            cfg.clip_extra_context_tokens * cfg.cross_attention_dim,
            dtype=self.dtype,
            name="proj",
        )(image_embeds.astype(self.dtype))
        x = x.reshape(
            -1, cfg.clip_extra_context_tokens, cfg.cross_attention_dim
        )
        return LayerNorm(dtype=self.dtype, name="norm")(x)


class AudioProj(nn.Module):
    config: AudioProjConfig = AudioProjConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio_embeds: jax.Array) -> jax.Array:
        """(B, F, window, blocks, channels) -> (B, F, context_tokens, output_dim)."""
        cfg = self.config
        b, f = audio_embeds.shape[0], audio_embeds.shape[1]
        x = audio_embeds.reshape(b * f, cfg.seq_len * cfg.blocks * cfg.channels)
        x = nn.relu(Dense(cfg.intermediate_dim, dtype=self.dtype, name="proj1")(x))
        x = nn.relu(Dense(cfg.intermediate_dim, dtype=self.dtype, name="proj2")(x))
        x = Dense(cfg.context_tokens * cfg.output_dim, dtype=self.dtype, name="proj3")(x)
        x = x.reshape(b * f, cfg.context_tokens, cfg.output_dim)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return x.reshape(b, f, cfg.context_tokens, cfg.output_dim)
