"""ReferenceNet: a 2D SD-1.5 UNet that *returns* its per-block normed
hidden states as an explicit feature pytree.

Reference: hallo/models/unet_2d_condition.py:93 (vendored diffusers UNet2D)
+ the write-mode attention hook (mutual_self_attention.py:223-232). Instead
of monkey-patching forwards and copying mutable banks, this module returns
`{"down_{i}": (feat, ...), "mid": (feat,), "up_{i}": (feat, ...)}` whose keys
match `DenoisingUNet`'s consumption sites 1:1 (the reference pairs blocks by
a stable channel-sorted order which is equivalent to structural pairing —
both UNets share the SD-1.5 topology).

Layout: (B', H, W, C) with B' = batch x (1 + n_motion_frames) x CFG folded by
the caller; the caller also pre-tiles the identity-token context (the
reference tiles it with `repeat(tmp, 1, 1)`, mutual_self_attention.py:341-349,
which misaligns frames and identities — see FaceAnimatePipeline for the
`legacy_context_tiling` knob that reproduces or fixes this).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import UNetConfig
from hallo_tpu.models.layers import (
    Conv,
    Dtype,
    GroupNorm,
    TimestepEmbedding,
    timestep_embedding,
)
from hallo_tpu.models.resnet import ResnetBlock, Downsample, Upsample
from hallo_tpu.models.transformer_spatial import ReferenceTransformer

RefFeatures = Dict[str, Tuple[jax.Array, ...]]


class _Resnet2D(nn.Module):
    """ResnetBlock on still images: wraps the video block with F=1."""

    out_channels: int
    groups: int
    eps: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        out = ResnetBlock(
            self.out_channels,
            groups=self.groups,
            eps=self.eps,
            inflated_groupnorm=False,
            dtype=self.dtype,
            name="block",
        )(x[:, None], temb)
        return out[:, 0]


class ReferenceNet(nn.Module):
    config: UNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        cond_tensor: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, RefFeatures]:
        """Args:
          sample: (B', H, W, C_in) reference + motion-frame latents.
          timesteps: scalar or (B',) — zeros at inference (face_animate.py:391).
          context: (B', T, D) identity tokens, pre-tiled by the caller.
          cond_tensor: optional (B', H', W', C0) added after conv_in
            (unet_2d_condition.py custom forward).

        Returns:
          (noise_pred, ref_features) — noise_pred is unused at inference but
          needed for stage-1 training parity.
        """
        cfg = self.config
        b = sample.shape[0]
        ch = cfg.block_out_channels
        heads = cfg.num_attention_heads
        features: RefFeatures = {}

        t = jnp.asarray(timesteps)
        if t.ndim == 0:
            t = jnp.broadcast_to(t[None], (b,))
        temb = timestep_embedding(t, ch[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(ch[0] * 4, dtype=self.dtype, name="time_embedding")(
            temb.astype(self.dtype)
        )

        x = Conv(ch[0], dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))
        if cond_tensor is not None:
            x = x + cond_tensor.astype(x.dtype)

        def attn(x, i_block, i_layer, key, out_ch):
            out, refs = ReferenceTransformer(
                heads,
                out_ch // heads,
                norm_num_groups=cfg.norm_num_groups,
                upcast_attention=cfg.upcast_attention,
                dtype=self.dtype,
                name=f"{key}_attentions_{i_layer}"
                if i_block is None
                else f"{key}_{i_block}_attentions_{i_layer}",
            )(x, context)
            return out, refs

        # --- down ---
        skips = [x]
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == len(ch) - 1
            site_feats = []
            for j in range(cfg.layers_per_block):
                x = _Resnet2D(
                    ch[i],
                    cfg.norm_num_groups,
                    cfg.norm_eps,
                    self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(x, temb)
                if block_type.startswith("CrossAttn"):
                    x, refs = attn(x, i, j, "down_blocks", ch[i])
                    site_feats.extend(refs)
                skips.append(x)
            if block_type.startswith("CrossAttn"):
                features[f"down_{i}"] = tuple(site_feats)
            if not is_final:
                x = Downsample(
                    ch[i], dtype=self.dtype, name=f"down_blocks_{i}_downsamplers_0"
                )(x[:, None])[:, 0]
                skips.append(x)

        # --- mid ---
        x = _Resnet2D(
            ch[-1], cfg.norm_num_groups, cfg.norm_eps, self.dtype,
            name="mid_block_resnets_0",
        )(x, temb)
        x, refs = attn(x, None, 0, "mid_block", ch[-1])
        features["mid"] = tuple(refs)
        x = _Resnet2D(
            ch[-1], cfg.norm_num_groups, cfg.norm_eps, self.dtype,
            name="mid_block_resnets_1",
        )(x, temb)

        # --- up ---
        rev = tuple(reversed(ch))
        n_layers_up = cfg.layers_per_block + 1
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == len(ch) - 1
            site_feats = []
            for j in range(n_layers_up):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = _Resnet2D(
                    rev[i],
                    cfg.norm_num_groups,
                    cfg.norm_eps,
                    self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(x, temb)
                if block_type.startswith("CrossAttn"):
                    x, refs = attn(x, i, j, "up_blocks", rev[i])
                    site_feats.extend(refs)
            if block_type.startswith("CrossAttn"):
                features[f"up_{i}"] = tuple(site_feats)
            if not is_final:
                x = Upsample(
                    rev[i], dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0"
                )(x[:, None])[:, 0]

        # --- out ---
        x = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = Conv(cfg.out_channels, dtype=self.dtype, name="conv_out")(x)
        return x, features
