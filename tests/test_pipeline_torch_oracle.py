"""Full-pipeline torch oracle at tiny scale (VERDICT r3 item 4).

The converter oracles (tests/test_convert_*_oracle.py) pin single module
forwards; this test pins the PIPELINE semantics end-to-end against a
hand-built torch replica of the reference's whole clip program:

  VAE-encode(ref + motion pixels, posterior mean * 0.18215)
  -> ReferenceNet @ t=0 under the LEGACY context tiling quirk
     (mutual_self_attention.py:341-349)
  -> feature-bank split into ref slot 0 / motion slots 1:
  -> CFG [uncond | cond] DDIM loop, where the uncond half gets: plain
     self-attention instead of the ref-KV concat (mutual_self_attention.py:
     264-284), zero audio tokens (face_animate.py:377-378), zero
     face-locator conditioning, the zero-image identity tokens — while the
     mask pyramid and motion features stay live
  -> batched VAE decode -> clip/round to uint8 -> motion-frame carry into
     the next clip (scripts/inference.py:294-310).

A divergence in the bank split, uncond masking, the cfg_split fast paths,
the ref-KV path (hoisted when HALLO_HOIST_REF_KV=1; default OFF — the r4
A/B measured the hoist slower at 512², see BASELINE.md), the CFG combine, the DDIM v-prediction update, the uint8 motion
carry, or the legacy tiling fails this test; the self-consistent golden
(test_e2e_golden.py) cannot distinguish those from consistent-but-wrong.

Reference semantics: hallo/animate/face_animate.py:249-442,
hallo/models/mutual_self_attention.py:155-284, scripts/inference.py:285-343.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from hallo_tpu.convert import torch_to_jax as cv
from hallo_tpu.pipelines.face_animate import (
    FaceAnimatePipeline,
    window_audio_embeddings,
)
from hallo_tpu.utils.factory import build_models

from tests.test_convert_unet_oracle import (
    TBasicBlock,
    TDownsample,
    TResnet,
    TTimeEmbedding,
    TUpsample,
    TVAEAttn,
    sinusoid,
)
from tests.test_convert_denoiser_oracle import TDenoiser

# ---------------------------------------------------------------------------
# torch replicas missing from the module oracles: a feats-returning 4-level
# ReferenceNet, a /8 (4-level) VAE, and the three small heads.
# ---------------------------------------------------------------------------


class TRefTransformer(tnn.Module):
    """Transformer2DModel that also returns each block's norm1 output — the
    value the reference's write-mode hook appends to the bank
    (mutual_self_attention.py:223-232)."""

    def __init__(self, dim, heads, head_dim, ctx_dim, groups=4):
        super().__init__()
        inner = heads * head_dim
        self.norm = tnn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = tnn.Conv2d(dim, inner, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(inner, heads, head_dim, ctx_dim)]
        )
        self.proj_out = tnn.Conv2d(inner, dim, 1)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        residual = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, -1)
        refs = []
        for blk in self.transformer_blocks:
            refs.append(blk.norm1(h))
            h = blk(h, ctx)
        h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
        return self.proj_out(h) + residual, refs


class TRefNet(tnn.Module):
    """4-level SD-1.5-topology ReferenceNet replica (reference
    unet_2d_condition.py:93 + write hook), diffusers key layout, matching
    `reference_unet_config(**TINY_UNET_KW)`: down (CrossAttn x3, Down),
    up (Up, CrossAttn x3), 1 layer/block."""

    def __init__(self, ch=(8, 16, 16, 16), heads=2, ctx_dim=12, groups=4):
        super().__init__()
        self.ch = ch
        temb = ch[0] * 4
        self.conv_in = tnn.Conv2d(4, ch[0], 3, padding=1)
        self.time_embedding = TTimeEmbedding(ch[0], temb)
        downs = []
        for i in range(3):
            cin = ch[i - 1] if i > 0 else ch[0]
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList([TResnet(cin, ch[i], temb, groups)])
            blk.attentions = tnn.ModuleList(
                [TRefTransformer(ch[i], heads, ch[i] // heads, ctx_dim, groups)]
            )
            blk.downsamplers = tnn.ModuleList([TDownsample(ch[i])])
            downs.append(blk)
        blk = tnn.Module()
        blk.resnets = tnn.ModuleList([TResnet(ch[2], ch[3], temb, groups)])
        downs.append(blk)
        self.down_blocks = tnn.ModuleList(downs)

        mid = tnn.Module()
        mid.resnets = tnn.ModuleList(
            [TResnet(ch[3], ch[3], temb, groups) for _ in range(2)]
        )
        mid.attentions = tnn.ModuleList(
            [TRefTransformer(ch[3], heads, ch[3] // heads, ctx_dim, groups)]
        )
        self.mid_block = mid

        rev = tuple(reversed(ch))
        ups = []
        blk = tnn.Module()
        blk.resnets = tnn.ModuleList(
            [
                TResnet(rev[0] * 2, rev[0], temb, groups),
                TResnet(rev[0] * 2, rev[0], temb, groups),
            ]
        )
        blk.upsamplers = tnn.ModuleList([TUpsample(rev[0])])
        ups.append(blk)
        skip_ch = [None, (rev[0], rev[1]), (rev[1], ch[0]), (ch[0], ch[0])]
        for i in range(1, 4):
            prev = rev[i - 1]
            s0, s1 = skip_ch[i]
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [
                    TResnet(prev + s0, rev[i], temb, groups),
                    TResnet(rev[i] + s1, rev[i], temb, groups),
                ]
            )
            blk.attentions = tnn.ModuleList(
                [
                    TRefTransformer(rev[i], heads, rev[i] // heads, ctx_dim, groups)
                    for _ in range(2)
                ]
            )
            if i < 3:
                blk.upsamplers = tnn.ModuleList([TUpsample(rev[i])])
            ups.append(blk)
        self.up_blocks = tnn.ModuleList(ups)

        self.conv_norm_out = tnn.GroupNorm(groups, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    def forward(self, x, timesteps, ctx):
        feats = {}
        temb = self.time_embedding(sinusoid(timesteps, self.ch[0]))
        h = self.conv_in(x)
        skips = [h]
        for i in range(3):
            blk = self.down_blocks[i]
            h = blk.resnets[0](h, temb)
            h, refs = blk.attentions[0](h, ctx)
            feats[f"down_{i}"] = list(refs)
            skips.append(h)
            h = blk.downsamplers[0](h)
            skips.append(h)
        h = self.down_blocks[3].resnets[0](h, temb)
        skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h, refs = self.mid_block.attentions[0](h, ctx)
        feats["mid"] = list(refs)
        h = self.mid_block.resnets[1](h, temb)

        blk = self.up_blocks[0]
        for j in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = blk.resnets[j](h, temb)
        h = blk.upsamplers[0](h)
        for i in range(1, 4):
            blk = self.up_blocks[i]
            site = []
            for j in range(2):
                h = torch.cat([h, skips.pop()], dim=1)
                h = blk.resnets[j](h, temb)
                h, refs = blk.attentions[j](h, ctx)
                site.extend(refs)
            feats[f"up_{i}"] = site
            if i < 3:
                h = blk.upsamplers[0](h)

        h = F.silu(self.conv_norm_out(h))
        return self.conv_out(h), feats


class TVAE4(tnn.Module):
    """4-level (/8) AutoencoderKL replica matching the factory TINY_AUX VAE
    (models/vae.py topology, diffusers key layout)."""

    def __init__(self, ch=(8, 8, 8, 8), latent=4, groups=4):
        super().__init__()
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, ch[0], 3, padding=1)
        downs = []
        for i in range(4):
            cin = ch[i - 1] if i > 0 else ch[0]
            d = tnn.Module()
            d.resnets = tnn.ModuleList(
                [TResnet(cin, ch[i], None, groups, eps=1e-6)]
            )
            if i < 3:
                d.downsamplers = tnn.ModuleList([tnn.Module()])
                d.downsamplers[0].conv = tnn.Conv2d(ch[i], ch[i], 3, stride=2, padding=0)
            downs.append(d)
        enc.down_blocks = tnn.ModuleList(downs)
        enc.mid_block = tnn.Module()
        enc.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch[3], ch[3], None, groups, eps=1e-6) for _ in range(2)]
        )
        enc.mid_block.attentions = tnn.ModuleList([TVAEAttn(ch[3], groups)])
        enc.conv_norm_out = tnn.GroupNorm(groups, ch[3], eps=1e-6)
        enc.conv_out = tnn.Conv2d(ch[3], 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)

        self.post_quant_conv = tnn.Conv2d(latent, latent, 1)
        rev = tuple(reversed(ch))
        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(latent, rev[0], 3, padding=1)
        dec.mid_block = tnn.Module()
        dec.mid_block.resnets = tnn.ModuleList(
            [TResnet(rev[0], rev[0], None, groups, eps=1e-6) for _ in range(2)]
        )
        dec.mid_block.attentions = tnn.ModuleList([TVAEAttn(rev[0], groups)])
        ups = []
        for i in range(4):
            cin = rev[i - 1] if i > 0 else rev[0]
            u = tnn.Module()
            u.resnets = tnn.ModuleList(
                [
                    TResnet(cin, rev[i], None, groups, eps=1e-6),
                    TResnet(rev[i], rev[i], None, groups, eps=1e-6),
                ]
            )
            if i < 3:
                u.upsamplers = tnn.ModuleList([TUpsample(rev[i])])
            ups.append(u)
        dec.up_blocks = tnn.ModuleList(ups)
        dec.conv_norm_out = tnn.GroupNorm(groups, rev[3], eps=1e-6)
        dec.conv_out = tnn.Conv2d(rev[3], 3, 3, padding=1)
        self.decoder = dec

    def encode_mean(self, x, sf):
        e = self.encoder
        h = e.conv_in(x)
        for i in range(4):
            h = e.down_blocks[i].resnets[0](h)
            if i < 3:
                h = F.pad(h, (0, 1, 0, 1))
                h = e.down_blocks[i].downsamplers[0].conv(h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        mean, _ = self.quant_conv(h).chunk(2, dim=1)
        return mean * sf

    def decode(self, z, sf):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z / sf))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for i in range(4):
            for j in range(2):
                h = d.up_blocks[i].resnets[j](h)
            if i < 3:
                h = d.up_blocks[i].upsamplers[0](h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


class TFaceLocator(tnn.Module):
    """face_locator.py:34-113 replica for TINY_AUX (ch (4,4,4,4), /8)."""

    def __init__(self, ch=(4, 4, 4, 4), emb=8):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, ch[0], 3, padding=1)
        blocks = []
        for i in range(3):
            blocks.append(tnn.Conv2d(ch[i], ch[i], 3, padding=1))
            blocks.append(tnn.Conv2d(ch[i], ch[i + 1], 3, padding=1, stride=2))
        self.blocks = tnn.ModuleList(blocks)
        self.conv_out = tnn.Conv2d(ch[3], emb, 3, padding=1)
        # Zero-init in the reference; give it small random values so the
        # conditioning branch is numerically live in this oracle.
        with torch.no_grad():
            self.conv_out.weight.copy_(torch.randn_like(self.conv_out.weight) * 0.05)
            self.conv_out.bias.copy_(torch.randn_like(self.conv_out.bias) * 0.05)

    def forward(self, x):  # (N, 3, H, W) -> (N, emb, H/8, W/8)
        h = F.silu(self.conv_in(x))
        for b in self.blocks:
            h = F.silu(b(h))
        return self.conv_out(h)


class TImageProj(tnn.Module):
    def __init__(self, in_dim=16, tokens=4, dim=12):
        super().__init__()
        self.tokens, self.dim = tokens, dim
        self.proj = tnn.Linear(in_dim, tokens * dim)
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):
        return self.norm(self.proj(x).reshape(-1, self.tokens, self.dim))


class TAudioProj(tnn.Module):
    def __init__(self, seq_len=3, blocks=2, channels=4, inter=8, out=6, tokens=3):
        super().__init__()
        self.dims = (seq_len * blocks * channels, tokens, out)
        self.proj1 = tnn.Linear(self.dims[0], inter)
        self.proj2 = tnn.Linear(inter, inter)
        self.proj3 = tnn.Linear(inter, tokens * out)
        self.norm = tnn.LayerNorm(out)

    def forward(self, x):  # (B, F, seq, blocks, ch) -> (B, F, tokens, out)
        b, f = x.shape[:2]
        in_dim, tk, od = self.dims
        h = x.reshape(b * f, in_dim)
        h = torch.relu(self.proj1(h))
        h = torch.relu(self.proj2(h))
        h = self.norm(self.proj3(h).reshape(b * f, tk, od))
        return h.reshape(b, f, tk, od)


# ---------------------------------------------------------------------------
# DDIM tables/update in float32 numpy (diffusers semantics; independent of
# hallo_tpu.diffusion — re-derived from configs/inference/default.yaml:79-90:
# linear betas 0.00085->0.012, zero-SNR rescale, v-prediction, trailing).
# ---------------------------------------------------------------------------


def ddim_tables(num_steps, train_steps=1000):
    betas = np.linspace(0.00085, 0.012, train_steps, dtype=np.float64)
    s = np.sqrt(np.cumprod(1.0 - betas))
    a0, aT = s[0], s[-1]
    s = (s - aT) * a0 / (a0 - aT)
    ab = s**2
    alphas = np.concatenate([ab[:1], ab[1:] / ab[:-1]])
    ac = np.cumprod(alphas).astype(np.float32)
    ts = np.round(np.arange(train_steps, 0, -train_steps / num_steps)).astype(
        np.int64
    ) - 1
    return ac, ts


def ddim_step_np(ac, ts, i, v_pred, sample, num_steps, train_steps=1000):
    t = int(ts[i])
    prev_t = t - train_steps // num_steps
    a_t = np.float32(ac[t])
    a_prev = np.float32(ac[prev_t]) if prev_t >= 0 else np.float32(ac[0])
    sa, s1 = np.sqrt(a_t), np.sqrt(1.0 - a_t)
    x0 = sa * sample - s1 * v_pred
    eps = sa * v_pred + s1 * sample
    return np.sqrt(a_prev) * x0 + np.sqrt(1.0 - a_prev) * eps


def _ok(report):
    assert not report["missing_in_ckpt"], report["missing_in_ckpt"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]
    assert not report["unmapped_ckpt_keys"], report["unmapped_ckpt_keys"][:10]


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_pipeline_matches_torch_replica():
    torch.manual_seed(3)
    tref = TRefNet().eval()
    tden = TDenoiser().eval()
    tvae = TVAE4().eval()
    tfl = TFaceLocator().eval()
    tip = TImageProj().eval()
    tap = TAudioProj().eval()
    # Perturb every attention to_out bias: zero-init biases would hide a
    # dropped bias term in the cfg_split audio fast path (see
    # attention_blocks.AudioTransformerBlock).
    with torch.no_grad():
        for name, p in list(tden.named_parameters()):
            if "to_out" in name and name.endswith("bias"):
                p.add_(torch.randn_like(p) * 0.05)

    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=64, width=64,
        clip_length=4, n_motion_frames=2,
    )
    p = models.params
    p["vae"], rep = cv.convert_vae(tvae.state_dict(), p["vae"])
    _ok(rep)
    p["reference_net"], rep = cv.convert_reference_unet(
        tref.state_dict(), p["reference_net"]
    )
    _ok(rep)
    p["denoising_net"], rep = cv.convert_denoising_unet(
        [tden.state_dict()], p["denoising_net"]
    )
    _ok(rep)
    p["face_locator"], rep = cv.convert_face_locator(
        tfl.state_dict(), p["face_locator"]
    )
    _ok(rep)
    p["image_proj"], rep = cv.convert_image_proj(tip.state_dict(), p["image_proj"])
    _ok(rep)
    p["audio_proj"], rep = cv.convert_audio_proj(tap.state_dict(), p["audio_proj"])
    _ok(rep)
    models.params = p

    b, h, w, f, m, steps, g = 1, 64, 64, 4, 2, 3, 3.5
    hl = h // 8
    n_clips = 2
    rng = np.random.default_rng(11)
    ref_image = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    audio_emb = rng.normal(size=(n_clips * f, 2, 4)).astype(np.float32)
    audio_windows = window_audio_embeddings(audio_emb, margin=1)  # (T, 3, 2, 4)
    face_emb = rng.normal(size=(b, 16)).astype(np.float32)
    face_region = (rng.uniform(size=(b, h, w, 3)) > 0.5).astype(np.float32)
    masks = tuple(
        tuple(
            (rng.uniform(size=(b, (hl // 2**d) ** 2)) > 0.3).astype(np.float32)
            for _ in range(3)
        )
        for d in range(4)
    )
    motion_scale = (1.2, 0.8, 0.5)

    pipe = FaceAnimatePipeline(
        models, num_inference_steps=steps, guidance_scale=g,
        clip_length=f, n_motion_frames=m,
    )
    video = pipe(
        ref_image, audio_windows, face_emb, face_region, masks,
        motion_scale=motion_scale, seed=7,
    )

    # The initial latents come from the pipeline's PRNG stream; replay the
    # identical stream for the replica (shared randomness, not shared math).
    key = jax.random.PRNGKey(7)
    lat_clips = []
    for _ in range(n_clips):
        key, sub = jax.random.split(key)
        lat_clips.append(
            np.asarray(jax.random.normal(sub, (b, f, hl, hl, 4), jnp.float32))
        )

    ac, ts = ddim_tables(steps)
    sf = 0.18215
    t_ms = torch.tensor(motion_scale, dtype=torch.float32)
    with torch.no_grad():
        tok_c = tip(torch.from_numpy(face_emb))
        tok_u = tip(torch.zeros_like(torch.from_numpy(face_emb)))
        fc_frame = tfl(torch.from_numpy(face_region).permute(0, 3, 1, 2))
        fc_v = fc_frame.unsqueeze(2).repeat(1, 1, f, 1, 1)  # (B, C0, F, hl, hl)
        masks_t = tuple(
            tuple(
                torch.from_numpy(np.repeat(mk, f, axis=0)) for mk in level
            )
            for level in masks
        )

        motion = np.repeat(ref_image[:, None], m, axis=1)
        outs = []
        for c in range(n_clips):
            ref_pixels = np.concatenate([ref_image[:, None], motion], axis=1)
            flat = torch.from_numpy(
                ref_pixels.reshape(b * (1 + m), h, w, 3)
            ).permute(0, 3, 1, 2)
            mean = tvae.encode_mean(flat, sf)  # (B*(1+M), 4, hl, hl)
            ref_lat = torch.cat([mean, mean], 0)  # CFG tile
            context = torch.cat([tok_u, tok_c], 0)  # (2B, T, D)
            ref_ctx = context.repeat(1 + m, 1, 1)  # LEGACY tiling
            _, feats = tref(
                ref_lat, torch.zeros(2 * b * (1 + m)), ref_ctx
            )

            def split(t):
                tt = t.reshape(2 * b, 1 + m, *t.shape[1:])
                return tt[:, 0], tt[:, 1:]

            rf_c, mf_u, mf_c, ref_none = {}, {}, {}, {}
            for k, v in feats.items():
                pairs = [split(x) for x in v]
                rf_c[k] = [r[b:] for r, _ in pairs]
                mf_u[k] = [mo[:b] for _, mo in pairs]
                mf_c[k] = [mo[b:] for _, mo in pairs]
                ref_none[k] = [None] * len(v)

            clip_audio = audio_windows[c * f : (c + 1) * f][None]  # (1, F, 3, 2, 4)
            clip_audio = np.broadcast_to(clip_audio, (b,) + clip_audio.shape[1:])
            at_clip = tap(torch.from_numpy(np.ascontiguousarray(clip_audio)))

            lat = lat_clips[c].copy()
            for i in range(steps):
                xt = torch.from_numpy(lat).permute(0, 4, 1, 2, 3)
                tvec = torch.full((b,), float(ts[i]))
                un = tden(
                    xt, tvec, tok_u, ref_none, mf_u,
                    torch.zeros_like(at_clip), torch.zeros_like(fc_v),
                    masks_t, t_ms,
                )
                co = tden(
                    xt, tvec, tok_c, rf_c, mf_c, at_clip, fc_v, masks_t, t_ms
                )
                pred = (un + g * (co - un)).permute(0, 2, 3, 4, 1).numpy()
                lat = ddim_step_np(ac, ts, i, pred, lat, steps)

            z = torch.from_numpy(lat.reshape(b * f, hl, hl, 4)).permute(0, 3, 1, 2)
            px = tvae.decode(z, sf).permute(0, 2, 3, 1).numpy()
            frames = np.round(np.clip(px / 2 + 0.5, 0.0, 1.0) * 255.0).astype(
                np.uint8
            )
            frames = frames.reshape(b, f, h, w, 3)
            motion = frames[:, -m:].astype(np.float32) / 127.5 - 1.0
            outs.append(frames.astype(np.float32) / 255.0)

    want = np.concatenate(outs, axis=1)
    assert video.shape == want.shape == (b, n_clips * f, h, w, 3)
    # Both sides round to uint8; drift through 3 CFG steps + decode plus a
    # possible 1/255 rounding flip bounds the allowed gap.
    np.testing.assert_allclose(video, want, atol=2.5 / 255)
