"""Encoder/mid/decoder stages of the denoising video UNet.

Reference: hallo/models/unet_3d_blocks.py. Per layer the order is
resnet -> spatial attention (ref-feature KV injection) -> audio attention ->
motion module, with ReferenceNet motion-frame features concatenated on the
time axis before the motion module and sliced off afterwards
(unet_3d_blocks.py:436-494).

The reference concatenates motion-frame features in all blocks on its
gradient-checkpointing (training) path but only in the mid block at eval
(unet_3d_blocks.py:750-770 vs :697-748); `fuse_motion_frames` reproduces
whichever behavior the caller selects.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import MotionModuleConfig
from hallo_tpu.models.motion import MotionModule
from hallo_tpu.models.resnet import Downsample, ResnetBlock, Upsample
from hallo_tpu.models.transformer_spatial import AudioTransformer, SpatialTransformer
from hallo_tpu.models.layers import Dtype


def fuse_motion_frames(
    motion_module: MotionModule,
    x: jax.Array,
    motion_feature: Optional[jax.Array],
) -> jax.Array:
    """Run the temporal module with ReferenceNet motion-frame features
    concatenated on the time axis and sliced back off
    (unet_3d_blocks.py:477-490); the concat/slice (and the clip-parallel
    frame<->site reshard, via the module's seq_axis attribute) live inside
    MotionModule."""
    b, f, h, w, c = x.shape
    mf = None
    if motion_feature is not None:
        m = motion_feature.shape[1]
        mf = motion_feature.reshape(b, m, h * w, c)
    return motion_module(x, mf)


def inner_remat(enable: bool):
    """Nested per-LAYER rematerialization inside a UNet block.

    The outer per-block remat (unet_denoise.maybe_remat) recomputes a whole
    block in the backward pass, but the recomputation then needs ALL of that
    block's intra-layer temporaries live at once — at 512²x16f the up_blocks_3
    replay alone holds >2 GB of motion-FF activations and lane-padded
    temporal-attention q/k/v copies (measured: the 22.16 G HBM OOM of the
    stage-2 full-width train step). Wrapping each sub-layer in its own remat
    bounds the replay's live set to one LAYER's temporaries: the classic
    nested-checkpoint trade (one extra forward of recompute inside a region
    that is already being recomputed)."""
    return nn.remat if enable else (lambda cls: cls)


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    in_channels: int
    heads: int
    norm_groups: int
    resnet_eps: float
    inflated_groupnorm: bool
    add_downsample: bool
    num_layers: int = 2
    use_audio_module: bool = False
    hierarchical_audio: bool = False
    motion_config: Optional[MotionModuleConfig] = None
    upcast_attention: bool = False
    cfg_split: bool = False
    fuse_motion: bool = False
    seq_axis: Optional[str] = None
    remat_inner: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: jax.Array,
        context: jax.Array,
        ref_features: Sequence[Optional[jax.Array]],
        motion_features: Sequence[Optional[jax.Array]],
        audio_context: Optional[jax.Array],
        masks: Optional[Tuple[jax.Array, jax.Array, jax.Array]],
        motion_scale: Optional[jax.Array],
        uncond_mask: Optional[jax.Array],
        ref_kv: Optional[Sequence] = None,
    ):
        R = inner_remat(self.remat_inner)
        states = []
        for i in range(self.num_layers):
            x = R(ResnetBlock)(
                self.out_channels,
                groups=self.norm_groups,
                eps=self.resnet_eps,
                inflated_groupnorm=self.inflated_groupnorm,
                seq_axis=self.seq_axis,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            x = R(SpatialTransformer)(
                self.heads,
                self.out_channels // self.heads,
                norm_num_groups=self.norm_groups,
                upcast_attention=self.upcast_attention,
                cfg_split=self.cfg_split,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, ref_features[i], context, uncond_mask,
              ref_kv[i] if ref_kv is not None else None)
            if self.use_audio_module and audio_context is not None:
                # Head-dim quirk: layer 0 derives from the block *input*
                # channels because the reference reassigns `in_channels`
                # inside its layer loop (unet_3d_blocks.py:552, 586-589).
                inner = self.in_channels if i == 0 else self.out_channels
                inner = (inner // self.heads) * self.heads
                x = R(AudioTransformer)(
                    self.heads,
                    inner,
                    hierarchical=self.hierarchical_audio,
                    norm_num_groups=self.norm_groups,
                    upcast_attention=self.upcast_attention,
                    cfg_split=self.cfg_split,
                    dtype=self.dtype,
                    name=f"audio_modules_{i}",
                )(
                    x,
                    audio_context,
                    *(masks if masks is not None else (None, None, None)),
                    motion_scale=motion_scale,
                )
            if self.motion_config is not None:
                mm = R(MotionModule)(
                    self.motion_config, dtype=self.dtype, remat_inner=self.remat_inner,
                    seq_axis=self.seq_axis, name=f"motion_modules_{i}"
                )
                x = fuse_motion_frames(
                    mm, x, motion_features[i] if self.fuse_motion else None,
                )
            states.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            states.append(x)
        return x, states


class DownBlock(nn.Module):
    out_channels: int
    norm_groups: int
    resnet_eps: float
    inflated_groupnorm: bool
    add_downsample: bool
    num_layers: int = 2
    motion_config: Optional[MotionModuleConfig] = None
    seq_axis: Optional[str] = None
    remat_inner: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array):
        R = inner_remat(self.remat_inner)
        states = []
        for i in range(self.num_layers):
            x = R(ResnetBlock)(
                self.out_channels,
                groups=self.norm_groups,
                eps=self.resnet_eps,
                inflated_groupnorm=self.inflated_groupnorm,
                seq_axis=self.seq_axis,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if self.motion_config is not None:
                x = R(MotionModule)(
                    self.motion_config, dtype=self.dtype, remat_inner=self.remat_inner,
                    seq_axis=self.seq_axis, name=f"motion_modules_{i}"
                )(x)
            states.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            states.append(x)
        return x, states


class MidBlock(nn.Module):
    channels: int
    in_channels_audio: int
    heads: int
    norm_groups: int
    resnet_eps: float
    inflated_groupnorm: bool
    use_audio_module: bool = False
    hierarchical_audio: bool = False
    motion_config: Optional[MotionModuleConfig] = None
    upcast_attention: bool = False
    cfg_split: bool = False
    fuse_motion: bool = True
    seq_axis: Optional[str] = None
    remat_inner: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: jax.Array,
        context: jax.Array,
        ref_features: Sequence[Optional[jax.Array]],
        motion_features: Sequence[Optional[jax.Array]],
        audio_context: Optional[jax.Array],
        masks: Optional[Tuple[jax.Array, jax.Array, jax.Array]],
        motion_scale: Optional[jax.Array],
        uncond_mask: Optional[jax.Array],
        ref_kv: Optional[Sequence] = None,
    ) -> jax.Array:
        R = inner_remat(self.remat_inner)
        x = R(ResnetBlock)(
            self.channels,
            groups=self.norm_groups,
            eps=self.resnet_eps,
            inflated_groupnorm=self.inflated_groupnorm,
            seq_axis=self.seq_axis,
            dtype=self.dtype,
            name="resnets_0",
        )(x, temb)
        x = R(SpatialTransformer)(
            self.heads,
            self.channels // self.heads,
            norm_num_groups=self.norm_groups,
            upcast_attention=self.upcast_attention,
            cfg_split=self.cfg_split,
            dtype=self.dtype,
            name="attentions_0",
        )(x, ref_features[0], context, uncond_mask,
          ref_kv[0] if ref_kv is not None else None)
        if self.use_audio_module and audio_context is not None:
            x = R(AudioTransformer)(
                self.heads,
                (self.in_channels_audio // self.heads) * self.heads,
                hierarchical=self.hierarchical_audio,
                norm_num_groups=self.norm_groups,
                upcast_attention=self.upcast_attention,
                cfg_split=self.cfg_split,
                dtype=self.dtype,
                name="audio_modules_0",
            )(
                x,
                audio_context,
                *(masks if masks is not None else (None, None, None)),
                motion_scale=motion_scale,
            )
        if self.motion_config is not None:
            mm = R(MotionModule)(
                self.motion_config, dtype=self.dtype, remat_inner=self.remat_inner,
                seq_axis=self.seq_axis, name="motion_modules_0"
            )
            x = fuse_motion_frames(
                mm, x, motion_features[0] if self.fuse_motion else None,
            )
        x = R(ResnetBlock)(
            self.channels,
            groups=self.norm_groups,
            eps=self.resnet_eps,
            inflated_groupnorm=self.inflated_groupnorm,
            seq_axis=self.seq_axis,
            dtype=self.dtype,
            name="resnets_1",
        )(x, temb)
        return x


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    in_channels_audio: int
    heads: int
    norm_groups: int
    resnet_eps: float
    inflated_groupnorm: bool
    add_upsample: bool
    num_layers: int = 3
    use_audio_module: bool = False
    hierarchical_audio: bool = False
    motion_config: Optional[MotionModuleConfig] = None
    upcast_attention: bool = False
    cfg_split: bool = False
    fuse_motion: bool = False
    seq_axis: Optional[str] = None
    remat_inner: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        skips: Sequence[jax.Array],
        temb: jax.Array,
        context: jax.Array,
        ref_features: Sequence[Optional[jax.Array]],
        motion_features: Sequence[Optional[jax.Array]],
        audio_context: Optional[jax.Array],
        masks: Optional[Tuple[jax.Array, jax.Array, jax.Array]],
        motion_scale: Optional[jax.Array],
        uncond_mask: Optional[jax.Array],
        ref_kv: Optional[Sequence] = None,
    ) -> jax.Array:
        R = inner_remat(self.remat_inner)
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = R(ResnetBlock)(
                self.out_channels,
                groups=self.norm_groups,
                eps=self.resnet_eps,
                inflated_groupnorm=self.inflated_groupnorm,
                seq_axis=self.seq_axis,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            x = R(SpatialTransformer)(
                self.heads,
                self.out_channels // self.heads,
                norm_num_groups=self.norm_groups,
                upcast_attention=self.upcast_attention,
                cfg_split=self.cfg_split,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, ref_features[i], context, uncond_mask,
              ref_kv[i] if ref_kv is not None else None)
            if self.use_audio_module and audio_context is not None:
                x = R(AudioTransformer)(
                    self.heads,
                    (self.in_channels_audio // self.heads) * self.heads,
                    hierarchical=self.hierarchical_audio,
                    norm_num_groups=self.norm_groups,
                    upcast_attention=self.upcast_attention,
                    cfg_split=self.cfg_split,
                    dtype=self.dtype,
                    name=f"audio_modules_{i}",
                )(
                    x,
                    audio_context,
                    *(masks if masks is not None else (None, None, None)),
                    motion_scale=motion_scale,
                )
            if self.motion_config is not None:
                mm = R(MotionModule)(
                    self.motion_config, dtype=self.dtype, remat_inner=self.remat_inner,
                    seq_axis=self.seq_axis, name=f"motion_modules_{i}"
                )
                x = fuse_motion_frames(
                    mm, x, motion_features[i] if self.fuse_motion else None,
                )
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UpBlock(nn.Module):
    out_channels: int
    norm_groups: int
    resnet_eps: float
    inflated_groupnorm: bool
    add_upsample: bool
    num_layers: int = 3
    motion_config: Optional[MotionModuleConfig] = None
    seq_axis: Optional[str] = None
    remat_inner: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skips: Sequence[jax.Array], temb: jax.Array):
        R = inner_remat(self.remat_inner)
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = R(ResnetBlock)(
                self.out_channels,
                groups=self.norm_groups,
                eps=self.resnet_eps,
                inflated_groupnorm=self.inflated_groupnorm,
                seq_axis=self.seq_axis,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if self.motion_config is not None:
                x = R(MotionModule)(
                    self.motion_config, dtype=self.dtype, remat_inner=self.remat_inner,
                    seq_axis=self.seq_axis, name=f"motion_modules_{i}"
                )(x)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x
