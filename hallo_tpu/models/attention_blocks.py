"""Transformer blocks for the UNets.

Functional re-design of hallo/models/attention.py + mutual_self_attention.py:
the reference's monkey-patched feature "bank" becomes explicit inputs/outputs.

- `BasicTransformerBlock` (ReferenceNet write-side): returns its pre-attention
  normed hidden states as `ref_feature` (the value the reference appends to
  `module.bank`, mutual_self_attention.py:223-232).
- `SpatialTransformerBlock` (denoiser read-side; reference
  TemporalBasicTransformerBlock under the read hook): self-attention whose KV
  is [self, ref_feature]; the CFG-uncond half masks out the ref tokens with an
  additive logits bias, which is exactly the reference's "plain self-attn for
  the uncond half" recomputation (mutual_self_attention.py:264-284) without a
  second attention call.
- `AudioTransformerBlock` (reference AudioTemporalBasicTransformerBlock,
  attention.py:621-907): hierarchical 3-branch masked audio cross-attention
  with zero-init per-channel projections.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hallo_tpu.models.layers import (
    CrossAttention,
    Dense,
    Dtype,
    FeedForward,
    LayerNorm,
)

NEG_INF = -1e9


class BasicTransformerBlock(nn.Module):
    """norm1 -> self-attn -> norm2 -> cross-attn(context) -> norm3 -> ff.

    Used by the ReferenceNet. Returns (hidden_states, ref_feature) where
    ref_feature is the norm1 output (reference attention.py:79-407 +
    mutual_self_attention.py write mode).
    """

    heads: int
    head_dim: int
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        normed = LayerNorm(dtype=self.dtype, name="norm1")(x)
        ref_feature = normed
        x = x + CrossAttention(
            self.heads,
            self.head_dim,
            upcast=self.upcast_attention,
            dtype=self.dtype,
            name="attn1",
        )(normed)
        normed = LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.heads,
            self.head_dim,
            upcast=self.upcast_attention,
            dtype=self.dtype,
            name="attn2",
        )(normed, context)
        x = x + FeedForward(x.shape[-1], dtype=self.dtype, name="ff")(
            LayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        return x, ref_feature


class SpatialTransformerBlock(nn.Module):
    """Denoiser spatial block with reference-feature KV injection.

    Inputs are frame-folded: x (B*F, L, C); ref_feature (B, L, C) from the
    ReferenceNet's matching block; context (B, T, Dc) identity tokens;
    uncond_mask (B,) marks CFG-uncond batch entries whose queries must not
    attend to ref tokens (reference mutual_self_attention.py:155-284).
    """

    heads: int
    head_dim: int
    upcast_attention: bool = False
    cfg_split: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        ref_feature: Optional[jax.Array],
        context: jax.Array,
        frames: int,
        uncond_mask: Optional[jax.Array] = None,
        ref_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        """ref_kv: optional pre-projected attn1 key/value rows for the ref
        tokens, each (B, Lref, inner) matching ref_feature's batch — the
        step-invariant half of the KV projection hoisted out of the sampling
        loop by `unet_denoise.spatial_ref_kv` (exact math: to_k/to_v have no
        bias, so projecting the concat equals concatenating the projections).
        """
        bf, l, c = x.shape
        b = bf // frames
        normed = LayerNorm(dtype=self.dtype, name="norm1")(x)

        attn1 = CrossAttention(
            self.heads,
            self.head_dim,
            upcast=self.upcast_attention,
            dtype=self.dtype,
            name="attn1",
        )

        def rep_kv(kv, sl):
            return tuple(
                jnp.repeat(t[sl].astype(normed.dtype), frames, axis=0) for t in kv
            )

        if ref_feature is None and ref_kv is None:
            x = x + attn1(normed)
        elif self.cfg_split:
            # Inference fast path: batch is the static CFG layout
            # [uncond B/2 | cond B/2] (frames inner). The uncond half never
            # attends to ref tokens, so give it plain self-attention (half
            # the KV work) instead of bias-masked attention over the concat —
            # numerically identical to the masked formulation.
            half = bf // 2
            out_u = attn1(normed[:half])
            if ref_kv is not None:
                out_c = attn1(
                    normed[half:], extra_kv=rep_kv(ref_kv, slice(b // 2, None))
                )
            else:
                ref_c = jnp.repeat(
                    ref_feature[b // 2 :].astype(normed.dtype), frames, axis=0
                )
                kv_c = jnp.concatenate([normed[half:], ref_c], axis=1)
                out_c = attn1(normed[half:], kv_c)
            x = x + jnp.concatenate([out_u, out_c], axis=0)
        else:
            # KV = [self tokens, ref tokens] per frame.
            if ref_kv is not None:
                extra = rep_kv(ref_kv, slice(None))
                l_ref = extra[0].shape[1]
            else:
                extra = None
                ref = jnp.repeat(ref_feature.astype(normed.dtype), frames, axis=0)
                kv = jnp.concatenate([normed, ref], axis=1)
                l_ref = ref.shape[1]
            bias = None
            if uncond_mask is not None:
                # (B,) -> (B*F, 1, 1, L + Lref): uncond entries mask ref tokens.
                blocked = jnp.repeat(uncond_mask, frames, axis=0).astype(jnp.float32)
                ref_bias = blocked[:, None, None, None] * NEG_INF
                bias = jnp.concatenate(
                    [
                        jnp.zeros((bf, 1, 1, l), jnp.float32),
                        jnp.broadcast_to(ref_bias, (bf, 1, 1, l_ref)),
                    ],
                    axis=-1,
                )
            if extra is not None:
                x = x + attn1(normed, bias=bias, extra_kv=extra)
            else:
                x = x + attn1(normed, kv, bias=bias)

        normed = LayerNorm(dtype=self.dtype, name="norm2")(x)
        ctx = jnp.repeat(context, frames, axis=0) if context.shape[0] == b else context
        x = x + CrossAttention(
            self.heads,
            self.head_dim,
            upcast=self.upcast_attention,
            dtype=self.dtype,
            name="attn2",
        )(normed, ctx)
        x = x + FeedForward(c, dtype=self.dtype, name="ff")(
            LayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        return x


class AudioTransformerBlock(nn.Module):
    """Hierarchical audio cross-attention block.

    x: (B*F, L, C); audio_context: (B*F, T_audio, Da); masks full/face/lip:
    (B*F, L) in [0,1]. When `hierarchical` is True, three parallel cross-attns
    are masked, passed through zero-init per-channel linears (the reference's
    1x1 zero convs, attention.py:691-701), and weighted by motion_scale
    [pose, face, lip] (attention.py:846-903). Otherwise a single cross-attn.
    """

    heads: int
    head_dim: int
    hierarchical: bool = True
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
        c = x.shape[-1]
        normed = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            self.heads,
            self.head_dim,
            out_dim=c,
            upcast=self.upcast_attention,
            dtype=self.dtype,
            name="attn1",
        )(normed)

        normed = LayerNorm(dtype=self.dtype, name="norm2")(x)
        # cfg_split inference fast path: the CFG-uncond half's audio tokens
        # are all-zero (face_animate.py:377-378), so softmax(q k^T) @ to_v(0)
        # = 0 and each branch's attention output collapses to to_out's BIAS
        # bo broadcast over tokens. The full uncond computation is therefore
        # scale * zero_conv(mask * bo) = scale * (mask ⊗ (W_zc @ bo) + b_zc)
        # per token — recovered exactly from two dummy-token evaluations
        # (zero_conv(bo) and zero_conv(0)) without running the uncond
        # attention. Pinned against the full path (with nonzero to_out
        # biases) by tests/test_pipeline_torch_oracle.py.
        half = normed.shape[0] // 2
        if self.cfg_split:
            normed_c, audio_c = normed[half:], audio_context[half:]
        else:
            normed_c, audio_c = normed, audio_context
        if self.hierarchical:
            if motion_scale is None:
                motion_scale = jnp.ones((3,), jnp.float32)
            acc_c = None
            acc_u = None
            for i, (name, zero_name, mask) in enumerate((
                ("attn2_0", "zero_conv_full", full_mask),
                ("attn2_1", "zero_conv_face", face_mask),
                ("attn2_2", "zero_conv_lip", lip_mask),
            )):
                attn = CrossAttention(
                    self.heads,
                    self.head_dim,
                    out_dim=c,
                    upcast=self.upcast_attention,
                    dtype=self.dtype,
                    name=name,
                )
                # 1x1 conv over channels == per-token linear.
                zero_conv = Dense(c, dtype=self.dtype, zero_init=True, name=zero_name)
                h = attn(normed_c, audio_c)
                if mask is not None:
                    m = mask[half:] if self.cfg_split else mask
                    h = h * m[:, :, None].astype(h.dtype)
                # NOTE: cast the scale to h.dtype — motion_scale arrives as a
                # concrete f32 array, and f32-scalar * bf16 promotes the whole
                # residual stream to f32 (xprof: ~68 ms/step of HBM-bound
                # fusions re-reading f32 (B*F, H*W, C) tensors at level 0).
                scale_i = motion_scale[i].astype(h.dtype)
                h = scale_i * zero_conv(h)
                acc_c = h if acc_c is None else acc_c + h
                if self.cfg_split:
                    da = audio_context.shape[-1]
                    # bo = attn to_out bias (attention of a zero query over
                    # zero audio tokens); weights shared by module name.
                    bo = attn(
                        jnp.zeros((1, 1, c), h.dtype),
                        jnp.zeros((1, 1, da), h.dtype),
                    )
                    zc_bo = zero_conv(bo)  # (1, 1, c): W @ bo + b
                    zc_0 = zero_conv(jnp.zeros((1, 1, c), h.dtype))  # b
                    if mask is not None:
                        m_u = mask[:half][:, :, None].astype(h.dtype)
                        bias_u = m_u * (zc_bo - zc_0) + zc_0
                    else:
                        bias_u = zc_bo
                    bias_u = scale_i * bias_u
                    acc_u = bias_u if acc_u is None else acc_u + bias_u
            if self.cfg_split:
                x = jnp.concatenate([x[:half] + acc_u, x[half:] + acc_c], axis=0)
            else:
                x = x + acc_c
        else:
            attn2 = CrossAttention(
                self.heads,
                self.head_dim,
                out_dim=c,
                upcast=self.upcast_attention,
                dtype=self.dtype,
                name="attn2",
            )
            out_c = attn2(normed_c, audio_c)
            if self.cfg_split:
                da = audio_context.shape[-1]
                out_u = attn2(
                    jnp.zeros((half, 1, c), out_c.dtype),
                    jnp.zeros((half, 1, da), out_c.dtype),
                )
                x = jnp.concatenate([x[:half] + out_u, x[half:] + out_c], axis=0)
            else:
                x = x + out_c

        x = x + FeedForward(c, dtype=self.dtype, name="ff")(
            LayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        return x
