"""FaceLocator: conv encoder turning the face-region mask video into an
additive conditioning feature at latent resolution (ControlNet-lite).

Reference: hallo/models/face_locator.py:34-113 — conv_in -> 3 x (conv +
stride-2 conv) over (16, 32, 64, 128) -> zero-init conv_out to 320 channels,
SiLU between convs, all frame-parallel.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import FaceLocatorConfig
from hallo_tpu.models.layers import Conv, Dtype, fold_time, unfold_time


class FaceLocator(nn.Module):
    config: FaceLocatorConfig = FaceLocatorConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mask: jax.Array) -> jax.Array:
        """(B, F, H, W, C_cond) mask video -> (B, F, H/8, W/8, C_embed)."""
        cfg = self.config
        x, f = fold_time(mask.astype(self.dtype))
        x = Conv(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        x = nn.silu(x)
        for i in range(len(cfg.block_out_channels) - 1):
            c_in = cfg.block_out_channels[i]
            c_out = cfg.block_out_channels[i + 1]
            x = Conv(c_in, dtype=self.dtype, name=f"blocks_{2*i}")(x)
            x = nn.silu(x)
            x = Conv(c_out, strides=(2, 2), dtype=self.dtype, name=f"blocks_{2*i+1}")(x)
            x = nn.silu(x)
        x = Conv(
            cfg.conditioning_embedding_channels,
            dtype=self.dtype,
            zero_init=True,
            name="conv_out",
        )(x)
        return unfold_time(x, f)
