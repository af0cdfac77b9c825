"""The denoising video UNet (reference: hallo/models/unet_3d.py:59-839).

TPU-first re-design: layout (B, F, H, W, C) channels-last; the reference's
monkey-patched feature bank becomes two explicit pytree arguments
(`ref_features` for the reference frame, `motion_features` for carried
motion frames), keyed "down_{i}" / "mid" / "up_{i}" with one entry per
attention layer — keys match `ReferenceNet`'s output so the pipeline simply
splits the writer's features (mutual_self_attention.py:235-252 semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.config import UNetConfig
from hallo_tpu.models.layers import (
    Conv,
    Dtype,
    GroupNorm,
    TimestepEmbedding,
    fold_time,
    timestep_embedding,
    unfold_time,
)
from hallo_tpu.models.unet_blocks import (
    CrossAttnDownBlock,
    CrossAttnUpBlock,
    DownBlock,
    MidBlock,
    UpBlock,
)

MaskPyramid = Tuple[Tuple[jax.Array, jax.Array, jax.Array], ...]


def spatial_ref_kv(
    params: Mapping[str, Any],
    ref_features: Mapping[str, Sequence[jax.Array]],
    dtype: Dtype = jnp.bfloat16,
) -> Dict[str, Tuple[Tuple[jax.Array, jax.Array], ...]]:
    """Project ReferenceNet features through each spatial attention's
    to_k/to_v ONCE (per clip) instead of per-frame x per-denoise-step.

    The spatial attention computes K/V over [self tokens, ref tokens]
    (reference mutual_self_attention.py:264-284); the ref tokens are
    step-invariant across the whole sampling loop, and to_k/to_v carry no
    bias, so `to_k(concat([self, ref]))` row-equals
    `concat([to_k(self), to_k(ref)])` — this hoists the invariant half out
    of the loop (2 matmuls x ~16 frames x 40 steps -> 2 matmuls per site).

    Returns a pytree mirroring `ref_features` ({key: ((k, v), ...)}), each
    k/v of shape (B, Lref, inner) — feed it to DenoisingUNet's `ref_kv`.
    `params` is the denoiser variable dict (or its "params" subtree).
    """
    p = params.get("params", params)
    out: Dict[str, Tuple[Tuple[jax.Array, jax.Array], ...]] = {}
    for key, feats in ref_features.items():
        if key == "mid":
            sites = [("mid_block", "attentions_0")]
        else:
            kind, idx = key.rsplit("_", 1)
            sites = [
                (f"{kind}_blocks_{idx}", f"attentions_{j}")
                for j in range(len(feats))
            ]
        kvs = []
        for feat, (blk, attn) in zip(feats, sites):
            a = p[blk][attn]["blocks_0"]["attn1"]
            wk = a["to_k"]["Dense_0"]["kernel"].astype(dtype)
            wv = a["to_v"]["Dense_0"]["kernel"].astype(dtype)
            x = feat.astype(dtype)
            kvs.append(
                (
                    jnp.einsum("blc,cm->blm", x, wk),
                    jnp.einsum("blc,cm->blm", x, wv),
                )
            )
        out[key] = tuple(kvs)
    return out


def _hierarchical(cfg: UNetConfig, block_name: str, depth: int) -> bool:
    """Whether this audio site uses the 3-branch masked attention
    (reference attention.py:718-761)."""
    return (
        block_name in cfg.stack_enable_blocks_name
        and depth in cfg.stack_enable_blocks_depth
    )


class DenoisingUNet(nn.Module):
    config: UNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        ref_features: Optional[Mapping[str, Sequence[jax.Array]]] = None,
        motion_features: Optional[Mapping[str, Sequence[jax.Array]]] = None,
        audio_context: Optional[jax.Array] = None,
        face_cond: Optional[jax.Array] = None,
        masks: Optional[MaskPyramid] = None,
        motion_scale: Optional[jax.Array] = None,
        uncond_mask: Optional[jax.Array] = None,
        train: bool = False,
        cfg_split: bool = False,
        seq_axis: Optional[str] = None,
        ref_kv: Optional[Mapping[str, Sequence[Tuple[jax.Array, jax.Array]]]] = None,
    ) -> jax.Array:
        """Predict v / epsilon for a noisy latent video.

        Args:
          sample: (B, F, H, W, C_in) noisy latents (B includes CFG doubling).
          timesteps: scalar or (B,) diffusion timestep.
          context: (B, T_id, D) identity tokens from ImageProj.
          ref_features: per-site (B, L, C) ReferenceNet features.
          motion_features: per-site (B, M, L, C) motion-frame features.
          audio_context: (B, F, T_audio, D_audio) audio tokens.
          face_cond: (B, F, H, W, C0) FaceLocator output added post conv_in
            (unet_3d.py:603-605).
          masks: per-depth (full, face, lip) masks, each (B*F, L_depth).
          motion_scale: (3,) [pose, face, lip] branch weights.
          uncond_mask: (B,) 1.0 where the entry is the CFG-uncond half.
          train: selects the reference's training-path motion-frame fusion
            (all blocks) instead of the eval path (mid only).
          cfg_split: static inference fast path — the batch is the CFG
            layout [uncond B/2 | cond B/2]; the uncond half runs plain
            self-attention (half the KV) instead of bias-masked attention.
          seq_axis: clip parallelism (inside shard_map): F is the per-device
            frame shard; temporal modules all_to_all frames<->sites and
            inflated GroupNorms psum their moments over this mesh axis.
            Frame-local inputs (sample, audio_context, face_cond, masks)
            carry the local frame count; ref/motion features and context
            are replicated.
          ref_kv: pre-projected spatial-attention K/V over the ref tokens
            from `spatial_ref_kv` (step-invariant — hoisted out of the
            sampling loop by the pipeline); same key structure as
            ref_features.
        """
        cfg = self.config
        b, f = sample.shape[0], sample.shape[1]
        ch = cfg.block_out_channels
        heads = cfg.num_attention_heads

        def feats(key: str, n: int) -> Sequence[Optional[jax.Array]]:
            if ref_features is None:
                return [None] * n
            return ref_features[key]

        def mfeats(key: str, n: int) -> Sequence[Optional[jax.Array]]:
            if motion_features is None:
                return [None] * n
            return motion_features[key]

        def rkv(key: str) -> Optional[Sequence[Tuple[jax.Array, jax.Array]]]:
            return None if ref_kv is None else ref_kv[key]

        def fuse_at(site: str) -> bool:
            if motion_features is None or not cfg.use_motion_module:
                return False
            mode = "all" if train else cfg.motion_frame_fusion
            return mode == "all" or site == mode

        # --- time embedding (fp32 sinusoid -> MLP) ---
        t = jnp.asarray(timesteps)
        if t.ndim == 0:
            t = jnp.broadcast_to(t[None], (b,))
        temb = timestep_embedding(t, ch[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(ch[0] * 4, dtype=self.dtype, name="time_embedding")(
            temb.astype(self.dtype)
        )

        # --- conv_in + face-locator conditioning ---
        x2, _ = fold_time(sample.astype(self.dtype))
        x2 = Conv(ch[0], dtype=self.dtype, name="conv_in")(x2)
        x = unfold_time(x2, f)
        if face_cond is not None:
            x = x + face_cond.astype(x.dtype)

        mm = cfg.motion_module if cfg.use_motion_module else None

        # Per-block rematerialization: recompute block activations in the
        # backward pass (the reference's gradient checkpointing).
        def maybe_remat(cls):
            if not cfg.remat:
                return cls
            return nn.remat(cls, static_argnums=())

        _CrossAttnDownBlock = maybe_remat(CrossAttnDownBlock)
        _DownBlock = maybe_remat(DownBlock)
        _MidBlock = maybe_remat(MidBlock)
        _CrossAttnUpBlock = maybe_remat(CrossAttnUpBlock)
        _UpBlock = maybe_remat(UpBlock)

        def mask_level(depth: int):
            if masks is None:
                return None
            return masks[depth]

        # --- down ---
        skips = [x]
        for i, block_type in enumerate(cfg.down_block_types):
            res = 2**i
            in_ch = ch[max(i - 1, 0)] if i > 0 else ch[0]
            use_mm = (
                mm is not None
                and res in cfg.motion_module_resolutions
                and not cfg.motion_module_decoder_only
            )
            is_final = i == len(ch) - 1
            if block_type.startswith("CrossAttn"):
                x, states = _CrossAttnDownBlock(
                    out_channels=ch[i],
                    in_channels=in_ch,
                    heads=heads,
                    norm_groups=cfg.norm_num_groups,
                    resnet_eps=cfg.norm_eps,
                    inflated_groupnorm=cfg.use_inflated_groupnorm,
                    add_downsample=not is_final,
                    num_layers=cfg.layers_per_block,
                    use_audio_module=cfg.use_audio_module,
                    hierarchical_audio=_hierarchical(cfg, "down", i),
                    motion_config=mm if use_mm else None,
                    upcast_attention=cfg.upcast_attention,
                    cfg_split=cfg_split,
                    fuse_motion=fuse_at("down"),
                    seq_axis=seq_axis,
                    remat_inner=cfg.remat_inner,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(
                    x,
                    temb,
                    context,
                    feats(f"down_{i}", cfg.layers_per_block),
                    mfeats(f"down_{i}", cfg.layers_per_block),
                    audio_context,
                    mask_level(i),
                    motion_scale,
                    uncond_mask,
                    rkv(f"down_{i}"),
                )
            else:
                x, states = _DownBlock(
                    out_channels=ch[i],
                    norm_groups=cfg.norm_num_groups,
                    resnet_eps=cfg.norm_eps,
                    inflated_groupnorm=cfg.use_inflated_groupnorm,
                    add_downsample=not is_final,
                    num_layers=cfg.layers_per_block,
                    motion_config=mm if use_mm else None,
                    seq_axis=seq_axis,
                    remat_inner=cfg.remat_inner,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, temb)
            skips.extend(states)

        # --- mid ---
        x = _MidBlock(
            channels=ch[-1],
            in_channels_audio=ch[-1],
            heads=heads,
            norm_groups=cfg.norm_num_groups,
            resnet_eps=cfg.norm_eps,
            inflated_groupnorm=cfg.use_inflated_groupnorm,
            use_audio_module=cfg.use_audio_module,
            hierarchical_audio=_hierarchical(cfg, "mid", 3),
            motion_config=mm if (mm is not None and cfg.motion_module_mid_block) else None,
            upcast_attention=cfg.upcast_attention,
            cfg_split=cfg_split,
            fuse_motion=fuse_at("mid"),
            seq_axis=seq_axis,
            remat_inner=cfg.remat_inner,
            dtype=self.dtype,
            name="mid_block",
        )(
            x,
            temb,
            context,
            feats("mid", 1),
            mfeats("mid", 1),
            audio_context,
            mask_level(3),
            motion_scale,
            uncond_mask,
            rkv("mid"),
        )

        # --- up ---
        rev = tuple(reversed(ch))
        n_layers_up = cfg.layers_per_block + 1
        for i, block_type in enumerate(cfg.up_block_types):
            res = 2 ** (3 - i)
            use_mm = mm is not None and res in cfg.motion_module_resolutions
            is_final = i == len(ch) - 1
            block_skips = skips[-n_layers_up:]
            skips = skips[:-n_layers_up]
            audio_in_ch = rev[min(i + 1, len(ch) - 1)]
            if block_type.startswith("CrossAttn"):
                x = _CrossAttnUpBlock(
                    out_channels=rev[i],
                    in_channels_audio=audio_in_ch,
                    heads=heads,
                    norm_groups=cfg.norm_num_groups,
                    resnet_eps=cfg.norm_eps,
                    inflated_groupnorm=cfg.use_inflated_groupnorm,
                    add_upsample=not is_final,
                    num_layers=n_layers_up,
                    use_audio_module=cfg.use_audio_module,
                    hierarchical_audio=_hierarchical(cfg, "up", 3 - i),
                    motion_config=mm if use_mm else None,
                    upcast_attention=cfg.upcast_attention,
                    cfg_split=cfg_split,
                    fuse_motion=fuse_at("up"),
                    seq_axis=seq_axis,
                    remat_inner=cfg.remat_inner,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(
                    x,
                    block_skips,
                    temb,
                    context,
                    feats(f"up_{i}", n_layers_up),
                    mfeats(f"up_{i}", n_layers_up),
                    audio_context,
                    mask_level(3 - i),
                    motion_scale,
                    uncond_mask,
                    rkv(f"up_{i}"),
                )
            else:
                x = _UpBlock(
                    out_channels=rev[i],
                    norm_groups=cfg.norm_num_groups,
                    resnet_eps=cfg.norm_eps,
                    inflated_groupnorm=cfg.use_inflated_groupnorm,
                    add_upsample=not is_final,
                    num_layers=n_layers_up,
                    motion_config=mm if use_mm else None,
                    seq_axis=seq_axis,
                    remat_inner=cfg.remat_inner,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, block_skips, temb)

        # --- out ---
        if cfg.use_inflated_groupnorm:
            x = GroupNorm(
                cfg.norm_num_groups, cfg.norm_eps, axis_name=seq_axis,
                name="conv_norm_out",
            )(x)
        else:
            x2, _ = fold_time(x)
            x2 = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, name="conv_norm_out")(x2)
            x = unfold_time(x2, f)
        x = nn.silu(x)
        x2, _ = fold_time(x)
        x2 = Conv(cfg.out_channels, dtype=self.dtype, name="conv_out")(x2)
        return unfold_time(x2, f)
