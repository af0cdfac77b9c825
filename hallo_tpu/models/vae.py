"""AutoencoderKL (sd-vae-ft-mse) encoder/decoder in JAX, channels-last.

The reference uses diffusers' AutoencoderKL as a frozen component
(scripts/inference.py:195, face_animate.py:331-336 encode.mean * 0.18215;
decode_latents / 0.18215 at face_animate.py:222-246). This implementation
follows the SD VAE architecture exactly so converted safetensors load 1:1:

- encoder: conv_in -> 4 down stages (2 resnets each + asymmetric-pad
  stride-2 downsample) -> mid (resnet, single-head attention, resnet)
  -> GN/SiLU/conv_out -> (mean, logvar); quant_conv 1x1
- decoder: post_quant_conv 1x1 -> conv_in -> mid -> 4 up stages (3 resnets
  + nearest-2x upsample) -> GN/SiLU/conv_out

Unlike the reference's per-frame Python decode loop (face_animate.py:238-241),
callers fold video frames into the batch axis and decode a whole clip in one
XLA program.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import VAEConfig
from hallo_tpu.models.layers import Conv, Dtype, GroupNorm, Up2xConv
from hallo_tpu.ops.attention import dot_product_attention


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = GroupNorm(self.groups, 1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = Conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.groups, 1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = Conv(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv(
                self.out_channels,
                kernel_size=(1, 1),
                padding=0,
                dtype=self.dtype,
                name="conv_shortcut",
            )(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (SD VAE mid block)."""

    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        normed = GroupNorm(self.groups, 1e-6, name="group_norm")(x).reshape(b, h * w, c)
        dense = lambda name: nn.Dense(
            c, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("to_q")(normed)[:, None, :, :]
        k = dense("to_k")(normed)[:, None, :, :]
        v = dense("to_v")(normed)[:, None, :, :]
        out = dot_product_attention(q, k, v)[:, 0]
        out = dense("to_out")(out)
        return x + out.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        h = Conv(ch[0], dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i, c in enumerate(ch):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(c, g, self.dtype, name=f"down_{i}_resnets_{j}")(h)
            if i < len(ch) - 1:
                # diffusers VAE downsample: asymmetric pad (0,1) then VALID
                # stride-2 conv.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    c,
                    kernel_size=(3, 3),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"down_{i}_downsample",
                )(h)
        h = VAEResnet(ch[-1], g, self.dtype, name="mid_resnets_0")(h)
        h = VAEAttention(g, self.dtype, name="mid_attn")(h)
        h = VAEResnet(ch[-1], g, self.dtype, name="mid_resnets_1")(h)
        h = GroupNorm(g, 1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = Conv(2 * cfg.latent_channels, dtype=self.dtype, name="conv_out")(h)
        h = Conv(
            2 * cfg.latent_channels,
            kernel_size=(1, 1),
            padding=0,
            dtype=self.dtype,
            name="quant_conv",
        )(h)
        return h  # (B, H/8, W/8, 2*latent): [mean, logvar]


class VAEDecoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        ch = tuple(reversed(cfg.block_out_channels))
        g = cfg.norm_num_groups
        h = Conv(
            cfg.latent_channels,
            kernel_size=(1, 1),
            padding=0,
            dtype=self.dtype,
            name="post_quant_conv",
        )(z.astype(self.dtype))
        h = Conv(ch[0], dtype=self.dtype, name="conv_in")(h)
        h = VAEResnet(ch[0], g, self.dtype, name="mid_resnets_0")(h)
        h = VAEAttention(g, self.dtype, name="mid_attn")(h)
        h = VAEResnet(ch[0], g, self.dtype, name="mid_resnets_1")(h)
        for i, c in enumerate(ch):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(c, g, self.dtype, name=f"up_{i}_resnets_{j}")(h)
            if i < len(ch) - 1:
                # Fused nearest-2x + conv (layers.Up2xConv): same params as
                # repeat + Conv; the 4x hi-res input never materializes.
                h = Up2xConv(c, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(g, 1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = Conv(cfg.out_channels, dtype=self.dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    """Combined module exposing encode_mean / decode / __call__."""

    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.config, self.dtype)
        self.decoder = VAEDecoder(self.config, self.dtype)

    def encode_moments(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, logvar

    def encode_mean(self, x: jax.Array) -> jax.Array:
        """Pixel (B,H,W,3) in [-1,1] -> scaled latent mean (the reference uses
        the posterior mean, not a sample: face_animate.py:335)."""
        mean, _ = self.encode_moments(x)
        return mean * self.config.scaling_factor

    def decode(self, z: jax.Array) -> jax.Array:
        """Scaled latent -> pixel (B,H,W,3) in [-1,1]."""
        return self.decoder(z / self.config.scaling_factor)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode_mean(x))
