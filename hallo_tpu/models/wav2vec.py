"""wav2vec2-base encoder in JAX with per-video-frame feature resampling.

Reference: hallo/models/wav2vec.py:21-209 — a HF Wav2Vec2Model whose conv
features are linearly interpolated to the video frame count (25 fps) before
the transformer encoder, returning all 12 layer hidden states
(audio_processor.py:118-127 stacks hidden_states[1:]).

Architecture follows facebook/wav2vec2-base-960h (do_stable_layer_norm=False,
feat_extract_norm="group") so converted HF weights load 1:1.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import Wav2Vec2Config
from hallo_tpu.models.layers import Dense, Dtype, LayerNorm
from hallo_tpu.ops.attention import dot_product_attention


def linear_resample(features: jax.Array, out_len: int) -> jax.Array:
    """Resample (B, T, C) -> (B, out_len, C) with align_corners=True linear
    interpolation (reference wav2vec.py:196-209 F.interpolate semantics)."""
    b, t, c = features.shape
    if t == out_len:
        return features
    pos = jnp.linspace(0.0, t - 1, out_len)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo.astype(pos.dtype))[None, :, None].astype(features.dtype)
    return features[:, lo] * (1 - w) + features[:, hi] * w


class FeatureEncoder(nn.Module):
    """7-layer conv feature extractor (group-norm on layer 0 only)."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, samples) -> (B, T, C)
        cfg = self.config
        h = x[:, :, None].astype(self.dtype)
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            h = nn.Conv(
                dim,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=cfg.conv_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(h)
            if i == 0 and cfg.feat_extract_norm == "group":
                # num_groups == num_channels (instance norm over time).
                scale = self.param("gn0_scale", nn.initializers.ones, (dim,), jnp.float32)
                bias = self.param("gn0_bias", nn.initializers.zeros, (dim,), jnp.float32)
                hf = h.astype(jnp.float32)
                mean = jnp.mean(hf, axis=1, keepdims=True)
                var = jnp.var(hf, axis=1, keepdims=True)
                h = ((hf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(
                    self.dtype
                )
            h = nn.gelu(h, approximate=False)
        return h


class EncoderLayer(nn.Module):
    """Post-norm transformer layer (wav2vec2-base)."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        b, t, c = h.shape

        dense = lambda feats, name: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense(c, "q_proj")(h).reshape(b, t, heads, head_dim).transpose(0, 2, 1, 3)
        k = dense(c, "k_proj")(h).reshape(b, t, heads, head_dim).transpose(0, 2, 1, 3)
        v = dense(c, "v_proj")(h).reshape(b, t, heads, head_dim).transpose(0, 2, 1, 3)
        attn = dot_product_attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, c)
        h = h + dense(c, "out_proj")(attn)
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(h)
        ff = dense(cfg.intermediate_size, "intermediate")(h)
        ff = nn.gelu(ff, approximate=False)
        h = h + dense(c, "output")(ff)
        return LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(h)


class Wav2Vec2(nn.Module):
    config: Wav2Vec2Config = Wav2Vec2Config()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_values: jax.Array, seq_len: int) -> jax.Array:
        """(B, samples) normalized waveform -> (B, seq_len, num_layers, hidden).

        seq_len is the static video frame count (25 fps); conv features are
        linearly resampled to it before the transformer (the reference's
        interposed interpolation, wav2vec.py:64-66).
        """
        cfg = self.config
        feats = FeatureEncoder(cfg, self.dtype, name="feature_extractor")(input_values)
        feats = linear_resample(feats, seq_len)

        # feature projection: LN -> Linear(512 -> 768)
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="fp_layer_norm")(feats)
        h = Dense(cfg.hidden_size, dtype=self.dtype, name="fp_projection")(h)

        # positional conv embedding (grouped conv k=128, SAME-ish with one
        # trailing element dropped for even kernels) + post-LN.
        pad = cfg.num_conv_pos_embeddings // 2
        pos = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.num_conv_pos_embeddings,),
            padding=[(pad, pad)],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="pos_conv",
        )(h)
        if cfg.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :-1]
        pos = nn.gelu(pos, approximate=False)
        h = h + pos
        h = LayerNorm(cfg.layer_norm_eps, dtype=self.dtype, name="encoder_layer_norm")(h)

        layer_states = []
        for i in range(cfg.num_hidden_layers):
            h = EncoderLayer(cfg, self.dtype, name=f"layers_{i}")(h)
            layer_states.append(h)
        # (B, T, L, C) — matches the reference's stack of hidden_states[1:]
        return jnp.stack(layer_states, axis=2)


def normalize_waveform(wave: jnp.ndarray) -> jnp.ndarray:
    """HF Wav2Vec2FeatureExtractor do_normalize: zero-mean unit-variance."""
    mean = wave.mean(axis=-1, keepdims=True)
    var = wave.var(axis=-1, keepdims=True)
    return (wave - mean) / jnp.sqrt(var + 1e-7)
