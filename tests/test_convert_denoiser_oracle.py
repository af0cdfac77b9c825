"""Oracle test for the 3D denoising-UNet weight converter.

A hand-built PyTorch replica of the reference's denoising UNet
(hallo/models/unet_3d.py + unet_3d_blocks.py + motion_module.py +
attention.py, diffusers key layout) runs the full video forward — inflated
GroupNorm resnets, ref-feature KV injection, hierarchical masked audio
attention with zero-convs and motion_scale, AnimateDiff temporal modules
with sinusoidal PE and motion-frame time-concat — and `convert_denoising_unet`
must make the JAX model reproduce it numerically, including the
AnimateDiff-style later-wins merge order (unet_3d.py:776-830).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from hallo_tpu.config import MotionModuleConfig, UNetConfig, denoising_unet_config
from hallo_tpu.convert import torch_to_jax as cv
from hallo_tpu.models.unet_denoise import DenoisingUNet

from tests.test_convert_unet_oracle import (
    TAttention,
    TFeedForward,
    TTimeEmbedding,
    sinusoid,
)

# ---------------------------------------------------------------------------
# torch replicas (reference forward semantics, diffusers key names)
# ---------------------------------------------------------------------------


def fold(x):  # (B, C, F, H, W) -> (B*F, C, H, W)
    b, c, f, h, w = x.shape
    return x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)


def unfold(x, f):  # (B*F, C, H, W) -> (B, C, F, H, W)
    bf, c, h, w = x.shape
    return x.reshape(bf // f, f, c, h, w).permute(0, 2, 1, 3, 4)


class TVResnet(tnn.Module):
    """ResnetBlock3D with InflatedGroupNorm (stats over F, H, W) and
    frame-folded convs (reference resnet.py:255-412)."""

    def __init__(self, cin, cout, temb_dim, groups, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):  # x: (B, C, F, H, W)
        f = x.shape[2]
        h = F.silu(self.norm1(x))  # 5D GN == inflated stats
        h = unfold(self.conv1(fold(h)), f)
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None, None]
        h = F.silu(self.norm2(h))
        h = unfold(self.conv2(fold(h)), f)
        sc = (
            unfold(self.conv_shortcut(fold(x)), f)
            if hasattr(self, "conv_shortcut")
            else x
        )
        return sc + h


class TSpatialBlock(tnn.Module):
    """TemporalBasicTransformerBlock under the read-mode hook: attn1 KV is
    [self tokens, ref tokens] (mutual_self_attention.py:155-284)."""

    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttention(dim, ctx_dim, heads, head_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, ref, ctx, frames):
        normed = self.norm1(x)
        if ref is None:
            kv = normed
        else:
            kv = torch.cat(
                [normed, torch.repeat_interleave(ref, frames, dim=0)], dim=1
            )
        x = x + self.attn1.forward_kv(normed, kv)
        x = x + self.attn2(self.norm2(x), torch.repeat_interleave(ctx, frames, dim=0))
        return x + self.ff(self.norm3(x))


# TAttention needs an explicit-KV entry point for the concat path.
def _attn_forward_kv(self, q_in, kv_in):
    b, l, _ = q_in.shape
    h, d = self.heads, self.head_dim

    def split(t):
        return t.reshape(b, -1, h, d).permute(0, 2, 1, 3)

    q, k, v = split(self.to_q(q_in)), split(self.to_k(kv_in)), split(self.to_v(kv_in))
    scores = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
    out = (scores @ v).permute(0, 2, 1, 3).reshape(b, l, h * d)
    return self.to_out[0](out)


TAttention.forward_kv = _attn_forward_kv


class TSpatialTransformer(tnn.Module):
    """Transformer3DModel wrapper: GN -> 1x1 proj_in -> block -> 1x1
    proj_out + residual, frames folded (transformer_3d.py:38-257)."""

    def __init__(self, dim, heads, head_dim, ctx_dim, groups):
        super().__init__()
        inner = heads * head_dim
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = tnn.Conv2d(dim, inner, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TSpatialBlock(inner, heads, head_dim, ctx_dim)]
        )
        self.proj_out = tnn.Conv2d(inner, dim, 1)

    def forward(self, x, ref, ctx):  # x: (B, C, F, H, W)
        f = x.shape[2]
        x2 = fold(x)
        bf, c, hh, ww = x2.shape
        residual = x2
        h = self.proj_in(self.norm(x2))
        h = h.permute(0, 2, 3, 1).reshape(bf, hh * ww, -1)
        for blk in self.transformer_blocks:
            h = blk(h, ref, ctx, f)
        h = h.reshape(bf, hh, ww, -1).permute(0, 3, 1, 2)
        return unfold(self.proj_out(h) + residual, f)


class TAudioBlock(tnn.Module):
    """AudioTemporalBasicTransformerBlock, hierarchical 3-branch masked audio
    attention with zero-init 1x1 convs and motion_scale weights
    (attention.py:621-907; the convs carry random weights here so converter
    bugs are visible)."""

    def __init__(self, dim, heads, head_dim, audio_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2_0 = TAttention(dim, audio_dim, heads, head_dim)
        self.attn2_1 = TAttention(dim, audio_dim, heads, head_dim)
        self.attn2_2 = TAttention(dim, audio_dim, heads, head_dim)
        self.zero_conv_full = tnn.Conv2d(dim, dim, 1)
        self.zero_conv_face = tnn.Conv2d(dim, dim, 1)
        self.zero_conv_lip = tnn.Conv2d(dim, dim, 1)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, audio, masks, motion_scale):
        x = x + self.attn1(self.norm1(x))
        normed = self.norm2(x)
        acc = None
        for i, (attn, zc, mask) in enumerate(
            (
                (self.attn2_0, self.zero_conv_full, masks[0]),
                (self.attn2_1, self.zero_conv_face, masks[1]),
                (self.attn2_2, self.zero_conv_lip, masks[2]),
            )
        ):
            h = attn(normed, audio)
            h = h * mask[:, :, None]
            # 1x1 conv over channels == per-token linear
            h = zc(h.transpose(1, 2)[:, :, :, None])[:, :, :, 0].transpose(1, 2)
            h = motion_scale[i] * h
            acc = h if acc is None else acc + h
        x = x + acc
        return x + self.ff(self.norm3(x))


class TAudioTransformer(tnn.Module):
    """Audio attention wrapper incl. the reference's inner-dim quirk
    (unet_3d_blocks.py:585-605): proj_in C -> inner, proj_out inner -> C."""

    def __init__(self, dim, inner, heads, audio_dim, groups):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = tnn.Conv2d(dim, inner, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TAudioBlock(inner, heads, inner // heads, audio_dim)]
        )
        self.proj_out = tnn.Conv2d(inner, dim, 1)

    def forward(self, x, audio, masks, motion_scale):
        f = x.shape[2]
        b = x.shape[0]
        x2 = fold(x)
        bf, c, hh, ww = x2.shape
        residual = x2
        h = self.proj_in(self.norm(x2))
        h = h.permute(0, 2, 3, 1).reshape(bf, hh * ww, -1)
        audio_f = audio.reshape(b * audio.shape[1], audio.shape[2], audio.shape[3])
        for blk in self.transformer_blocks:
            h = blk(h, audio_f, masks, motion_scale)
        h = h.reshape(bf, hh, ww, -1).permute(0, 3, 1, 2)
        return unfold(self.proj_out(h) + residual, f)


class TVersatileAttention(tnn.Module):
    """VersatileAttention (Temporal mode) + PositionalEncoding buffer
    (motion_module.py:426-607)."""

    def __init__(self, dim, heads, head_dim, max_len):
        super().__init__()
        self.to_q = tnn.Linear(dim, heads * head_dim, bias=False)
        self.to_k = tnn.Linear(dim, heads * head_dim, bias=False)
        self.to_v = tnn.Linear(dim, heads * head_dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(heads * head_dim, dim)])
        self.heads, self.head_dim = heads, head_dim
        pe = torch.zeros(max_len, dim)
        position = torch.arange(max_len, dtype=torch.float32)[:, None]
        div = torch.exp(
            torch.arange(0, dim, 2, dtype=torch.float32) * (-math.log(10000.0) / dim)
        )
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        pos = tnn.Module()
        pos.register_buffer("pe", pe)
        self.pos_encoder = pos

    def forward(self, x):  # x: (B, T, L, C) normed
        b, t, l, c = x.shape
        x = x + self.pos_encoder.pe[None, :t, None, :]
        # (b d) f c layout, like the reference rearrange
        xs = x.permute(0, 2, 1, 3).reshape(b * l, t, c)
        h, d = self.heads, self.head_dim

        def split(z):
            return z.reshape(b * l, t, h, d).permute(0, 2, 1, 3)

        q, k, v = split(self.to_q(xs)), split(self.to_k(xs)), split(self.to_v(xs))
        scores = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        out = (scores @ v).permute(0, 2, 1, 3).reshape(b * l, t, h * d)
        out = self.to_out[0](out)
        return out.reshape(b, l, t, c).permute(0, 2, 1, 3)


class TTemporalTransformer(tnn.Module):
    """TemporalTransformer3DModel internals (motion_module.py:200-316)."""

    def __init__(self, dim, heads, head_dim, max_len, groups):
        super().__init__()
        inner = heads * head_dim
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = tnn.Linear(dim, inner)
        blk = tnn.Module()
        blk.attention_blocks = tnn.ModuleList(
            [
                TVersatileAttention(inner, heads, head_dim, max_len),
                TVersatileAttention(inner, heads, head_dim, max_len),
            ]
        )
        blk.norms = tnn.ModuleList([tnn.LayerNorm(inner), tnn.LayerNorm(inner)])
        blk.ff = TFeedForward(inner)
        blk.ff_norm = tnn.LayerNorm(inner)
        self.transformer_blocks = tnn.ModuleList([blk])
        self.proj_out = tnn.Linear(inner, dim)


class TMotionModule(tnn.Module):
    """VanillaTemporalModule with motion-frame time-concat
    (unet_3d_blocks.py:477-490)."""

    def __init__(self, dim, heads, head_dim, max_len, groups):
        super().__init__()
        self.temporal_transformer = TTemporalTransformer(
            dim, heads, head_dim, max_len, groups
        )

    def forward(self, x, motion_feats=None):  # x: (B, C, F, H, W)
        tt = self.temporal_transformer
        b, c, f, hh, ww = x.shape
        l = hh * ww

        def prep(z):  # (B, C, T, H', W') -> (B, T, L', C') normed+projected
            t = z.shape[2]
            zn = tt.norm(fold(z))
            zn = zn.permute(0, 2, 3, 1).reshape(b, t, -1, c)
            return tt.proj_in(zn)

        residual = x
        hs = prep(x)
        m = 0
        if motion_feats is not None:  # (B, M, L, C) token-form features
            m = motion_feats.shape[1]
            mf = motion_feats.permute(0, 3, 1, 2).reshape(b, c, m, hh, ww)
            hs = torch.cat([prep(mf), hs], dim=1)

        blk = tt.transformer_blocks[0]
        for j in range(2):
            hs = hs + blk.attention_blocks[j](blk.norms[j](hs))
        hs = hs + blk.ff(blk.ff_norm(hs))

        hs = tt.proj_out(hs[:, m:])
        out = hs.permute(0, 3, 1, 2).reshape(b, -1, f, hh, ww)
        return out + residual


class TVDownsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return unfold(self.conv(fold(x)), x.shape[2])


class TVUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        f = x.shape[2]
        h = F.interpolate(fold(x), scale_factor=2, mode="nearest")
        return unfold(self.conv(h), f)


class TDenoiser(tnn.Module):
    """Tiny reference denoising UNet: ch (8, 16, 16, 16), 1 layer/block,
    down (CrossAttn x3, Down), up (Up, CrossAttn x3), audio + motion
    everywhere the config enables them (unet_3d.py:59-361 topology)."""

    def __init__(self, ch=(8, 16, 16, 16), heads=2, ctx_dim=12, audio_dim=6,
                 groups=4, max_len=8):
        super().__init__()
        self.ch, self.heads = ch, heads
        temb = ch[0] * 4
        self.conv_in = tnn.Conv2d(4, ch[0], 3, padding=1)
        self.time_embedding = TTimeEmbedding(ch[0], temb)

        def motion(dim):
            return TMotionModule(dim, heads, dim // heads, max_len, groups)

        def spatial(dim):
            return TSpatialTransformer(dim, heads, dim // heads, ctx_dim, groups)

        def audio(dim, in_ch):
            inner = (in_ch // heads) * heads
            return TAudioTransformer(dim, inner, heads, audio_dim, groups)

        downs = []
        for i in range(3):  # CrossAttn down blocks
            cin = ch[max(i - 1, 0)] if i > 0 else ch[0]
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList([TVResnet(cin, ch[i], temb, groups)])
            blk.attentions = tnn.ModuleList([spatial(ch[i])])
            blk.audio_modules = tnn.ModuleList([audio(ch[i], cin)])
            blk.motion_modules = tnn.ModuleList([motion(ch[i])])
            blk.downsamplers = tnn.ModuleList([TVDownsample(ch[i])])
            downs.append(blk)
        blk = tnn.Module()  # plain DownBlock (final, no downsample)
        blk.resnets = tnn.ModuleList([TVResnet(ch[2], ch[3], temb, groups)])
        blk.motion_modules = tnn.ModuleList([motion(ch[3])])
        downs.append(blk)
        self.down_blocks = tnn.ModuleList(downs)

        mid = tnn.Module()
        mid.resnets = tnn.ModuleList(
            [TVResnet(ch[3], ch[3], temb, groups) for _ in range(2)]
        )
        mid.attentions = tnn.ModuleList([spatial(ch[3])])
        mid.audio_modules = tnn.ModuleList([audio(ch[3], ch[3])])
        mid.motion_modules = tnn.ModuleList([motion(ch[3])])
        self.mid_block = mid

        rev = tuple(reversed(ch))  # (16, 16, 16, 8)
        ups = []
        blk = tnn.Module()  # plain UpBlock
        blk.resnets = tnn.ModuleList(
            [
                TVResnet(rev[0] * 2, rev[0], temb, groups),
                TVResnet(rev[0] * 2, rev[0], temb, groups),
            ]
        )
        blk.motion_modules = tnn.ModuleList([motion(rev[0]), motion(rev[0])])
        blk.upsamplers = tnn.ModuleList([TVUpsample(rev[0])])
        ups.append(blk)
        skip_ch = [  # channels of the two popped skips per up block (last first)
            None,
            (rev[0], rev[1]),  # up1: d2 state (16), d1 downsample (16)
            (rev[1], ch[0]),   # up2: d1 state (16), d0 downsample (8)
            (ch[0], ch[0]),    # up3: d0 state (8), conv_in (8)
        ]
        for i in range(1, 4):  # CrossAttn up blocks
            prev = rev[i - 1]
            audio_in = rev[min(i + 1, 3)]
            blk = tnn.Module()
            s0, s1 = skip_ch[i]
            blk.resnets = tnn.ModuleList(
                [
                    TVResnet(prev + s0, rev[i], temb, groups),
                    TVResnet(rev[i] + s1, rev[i], temb, groups),
                ]
            )
            blk.attentions = tnn.ModuleList([spatial(rev[i]), spatial(rev[i])])
            blk.audio_modules = tnn.ModuleList(
                [audio(rev[i], audio_in), audio(rev[i], audio_in)]
            )
            blk.motion_modules = tnn.ModuleList([motion(rev[i]), motion(rev[i])])
            if i < 3:
                blk.upsamplers = tnn.ModuleList([TVUpsample(rev[i])])
            ups.append(blk)
        self.up_blocks = tnn.ModuleList(ups)

        self.conv_norm_out = tnn.GroupNorm(groups, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    def forward(self, x, timesteps, ctx, ref_feats, motion_feats, audio,
                face_cond, masks, motion_scale):
        # x: (B, C, F, H, W); ref_feats/motion_feats: dicts of token arrays.
        f = x.shape[2]
        temb = self.time_embedding(sinusoid(timesteps, self.ch[0]))
        h = unfold(self.conv_in(fold(x)), f) + face_cond

        skips = [h]
        for i in range(3):
            blk = self.down_blocks[i]
            h = blk.resnets[0](h, temb)
            h = blk.attentions[0](h, ref_feats[f"down_{i}"][0], ctx)
            h = blk.audio_modules[0](h, audio, masks[i], motion_scale)
            h = blk.motion_modules[0](h)  # eval: no motion frames off-mid
            skips.append(h)
            h = blk.downsamplers[0](h)
            skips.append(h)
        blk = self.down_blocks[3]
        h = blk.resnets[0](h, temb)
        h = blk.motion_modules[0](h)
        skips.append(h)

        mid = self.mid_block
        h = mid.resnets[0](h, temb)
        h = mid.attentions[0](h, ref_feats["mid"][0], ctx)
        h = mid.audio_modules[0](h, audio, masks[3], motion_scale)
        h = mid.motion_modules[0](h, motion_feats["mid"][0])
        h = mid.resnets[1](h, temb)

        blk = self.up_blocks[0]
        for j in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = blk.resnets[j](h, temb)
            h = blk.motion_modules[j](h)
        h = blk.upsamplers[0](h)
        for i in range(1, 4):
            blk = self.up_blocks[i]
            depth = 3 - i
            for j in range(2):
                h = torch.cat([h, skips.pop()], dim=1)
                h = blk.resnets[j](h, temb)
                h = blk.attentions[j](h, ref_feats[f"up_{i}"][j], ctx)
                h = blk.audio_modules[j](h, audio, masks[depth], motion_scale)
                h = blk.motion_modules[j](h)
            if i < 3:
                h = blk.upsamplers[0](h)

        h = F.silu(self.conv_norm_out(h))
        return unfold(self.conv_out(fold(h)), f)


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_denoising_unet_converter_oracle():
    torch.manual_seed(0)
    oracle = TDenoiser().eval()

    cfg = denoising_unet_config(
        block_out_channels=(8, 16, 16, 16),
        layers_per_block=1,
        num_attention_heads=2,
        cross_attention_dim=12,
        norm_num_groups=4,
        audio_attention_dim=6,
        motion_module=MotionModuleConfig(
            num_attention_heads=2,
            num_transformer_block=1,
            temporal_position_encoding_max_len=8,
            norm_num_groups=4,
        ),
    )
    model = DenoisingUNet(cfg)

    b, f, hw, m = 2, 2, 16, 1
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.normal(size=shape).astype(np.float32)

    x = r(b, f, hw, hw, 4)
    t = np.array([3.0, 11.0], np.float32)
    ctx = r(b, 4, 12)
    audio = r(b, f, 3, 6)
    face_cond = r(b, f, hw, hw, 8)
    motion_scale = np.array([1.3, 0.7, 0.4], np.float32)
    l_by_depth = [256, 64, 16, 4]
    masks = tuple(
        tuple(
            (rng.uniform(size=(b * f, l)) > 0.3).astype(np.float32)
            for _ in range(3)
        )
        for l in l_by_depth
    )
    feat_dims = {
        "down_0": [(256, 8)], "down_1": [(64, 16)], "down_2": [(16, 16)],
        "mid": [(4, 16)],
        "up_1": [(16, 16), (16, 16)], "up_2": [(64, 16), (64, 16)],
        "up_3": [(256, 8), (256, 8)],
    }
    ref_feats = {
        k: tuple(r(b, l, c) for l, c in dims) for k, dims in feat_dims.items()
    }
    motion_feats = {
        k: tuple(r(b, m, l, c) for l, c in dims) for k, dims in feat_dims.items()
    }

    jx = {k: jnp.asarray(v) for k, v in
          dict(x=x, t=t, ctx=ctx, audio=audio, face_cond=face_cond,
               motion_scale=motion_scale).items()}
    jref = jax.tree_util.tree_map(jnp.asarray, ref_feats)
    jmot = jax.tree_util.tree_map(jnp.asarray, motion_feats)
    jmasks = jax.tree_util.tree_map(jnp.asarray, masks)

    def apply(params):
        return model.apply(
            params, jx["x"], jx["t"], jx["ctx"], ref_features=jref,
            motion_features=jmot, audio_context=jx["audio"],
            face_cond=jx["face_cond"], masks=jmasks,
            motion_scale=jx["motion_scale"],
        )

    init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jx["x"], jx["t"], jx["ctx"],
        ref_features=jref, motion_features=jmot, audio_context=jx["audio"],
        face_cond=jx["face_cond"], masks=jmasks,
        motion_scale=jx["motion_scale"],
    )

    # AnimateDiff-style split + later-wins merge: the spatial dict carries a
    # deliberately WRONG conv_in (and no motion keys); the second dict holds
    # the motion modules and the correct conv_in — merge order must fix it.
    sd = {k: v.clone() for k, v in oracle.state_dict().items()}
    sd_spatial = {k: v for k, v in sd.items() if "motion_modules" not in k}
    sd_spatial["conv_in.weight"] = torch.zeros_like(sd["conv_in.weight"])
    sd_motion = {k: v for k, v in sd.items() if "motion_modules" in k}
    sd_motion["conv_in.weight"] = sd["conv_in.weight"]

    params, report = cv.convert_denoising_unet([sd_spatial, sd_motion], init)
    assert not report["missing_in_ckpt"], report["missing_in_ckpt"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]
    assert not report["unmapped_ckpt_keys"], report["unmapped_ckpt_keys"][:10]

    got = np.asarray(jax.jit(apply)(params))

    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x).permute(0, 4, 1, 2, 3),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
            {k: [torch.from_numpy(a) for a in v] for k, v in ref_feats.items()},
            {k: [torch.from_numpy(a) for a in v] for k, v in motion_feats.items()},
            torch.from_numpy(audio),
            torch.from_numpy(face_cond).permute(0, 4, 1, 2, 3),
            tuple(tuple(torch.from_numpy(a) for a in lvl) for lvl in masks),
            torch.from_numpy(motion_scale),
        )
    want = want.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
