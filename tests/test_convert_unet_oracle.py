"""Oracle tests for the SD-UNet / VAE weight converters.

Hand-built PyTorch replicas of the reference's modules (diffusers layout and
forward semantics: hallo/models/unet_2d_condition.py, diffusers AutoencoderKL
as used by scripts/inference.py:195) are randomly initialized, their state
dicts run through `convert_reference_unet` / `convert_vae`, and the JAX
models must reproduce the torch outputs numerically. Any transpose/path bug
in the converter (or layout bug in the models) fails these tests.

The torch modules are written attribute-for-attribute so their state-dict
keys are exactly the diffusers checkpoint keys the converter consumes.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from hallo_tpu.config import UNetConfig, VAEConfig
from hallo_tpu.convert import torch_to_jax as cv
from hallo_tpu.models.unet_ref import ReferenceNet
from hallo_tpu.models.vae import AutoencoderKL

# ---------------------------------------------------------------------------
# torch replicas (diffusers semantics + key names)
# ---------------------------------------------------------------------------


class TResnet(tnn.Module):
    """diffusers ResnetBlock2D, default config (GN -> silu -> conv ×2,
    time_emb added between, 1x1 shortcut)."""

    def __init__(self, cin, cout, temb_dim=None, groups=4, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TAttention(tnn.Module):
    """diffusers Attention: to_q/k/v bias-free, to_out.0 with bias."""

    def __init__(self, q_dim, kv_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(q_dim, inner, bias=False)
        self.to_k = tnn.Linear(kv_dim, inner, bias=False)
        self.to_v = tnn.Linear(kv_dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, q_dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, l, _ = x.shape
        h, d = self.heads, self.head_dim

        def split(t):
            return t.reshape(b, -1, h, d).permute(0, 2, 1, 3)

        q, k, v = split(self.to_q(x)), split(self.to_k(ctx)), split(self.to_v(ctx))
        scores = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        out = (scores @ v).permute(0, 2, 1, 3).reshape(b, l, h * d)
        return self.to_out[0](out)


class TFeedForward(tnn.Module):
    """diffusers FeedForward (GEGLU): net.0.proj, net.2."""

    class GEGLU(tnn.Module):
        def __init__(self, dim, inner):
            super().__init__()
            self.proj = tnn.Linear(dim, inner * 2)

        def forward(self, x):
            value, gate = self.proj(x).chunk(2, dim=-1)
            return value * F.gelu(gate)

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = tnn.ModuleList(
            [self.GEGLU(dim, inner), tnn.Identity(), tnn.Linear(inner, dim)]
        )

    def forward(self, x):
        for mod in self.net:
            x = mod(x)
        return x


class TBasicBlock(tnn.Module):
    """diffusers BasicTransformerBlock (self + cross + ff)."""

    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, dim, heads, head_dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttention(dim, ctx_dim, heads, head_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class TTransformer2D(tnn.Module):
    """diffusers Transformer2DModel, use_linear_projection=False."""

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
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
        return self.proj_out(h) + residual


class TDownsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TTimeEmbedding(tnn.Module):
    def __init__(self, dim, out):
        super().__init__()
        self.linear_1 = tnn.Linear(dim, out)
        self.linear_2 = tnn.Linear(out, out)

    def forward(self, t):
        return self.linear_2(F.silu(self.linear_1(t)))


def sinusoid(timesteps, dim):
    """diffusers Timesteps, flip_sin_to_cos=True, freq_shift=0."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = torch.exp(exponent)[None] * timesteps.float()[:, None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TUNet2D(tnn.Module):
    """Tiny diffusers-layout UNet2DConditionModel replica: 2 levels,
    down = (CrossAttn, Down), up = (Up, CrossAttn), 1 layer/block.
    Mirrors the reference's vendored unet_2d_condition.py forward."""

    def __init__(self, ch=(8, 16), ctx_dim=12, heads=2, groups=4):
        super().__init__()
        self.ch = ch
        self.conv_in = tnn.Conv2d(4, ch[0], 3, padding=1)
        self.time_embedding = TTimeEmbedding(ch[0], ch[0] * 4)
        temb = ch[0] * 4

        down0 = tnn.Module()
        down0.resnets = tnn.ModuleList([TResnet(ch[0], ch[0], temb, groups)])
        down0.attentions = tnn.ModuleList(
            [TTransformer2D(ch[0], heads, ch[0] // heads, ctx_dim, groups)]
        )
        down0.downsamplers = tnn.ModuleList([TDownsample(ch[0])])
        down1 = tnn.Module()
        down1.resnets = tnn.ModuleList([TResnet(ch[0], ch[1], temb, groups)])
        self.down_blocks = tnn.ModuleList([down0, down1])

        mid = tnn.Module()
        mid.resnets = tnn.ModuleList(
            [TResnet(ch[1], ch[1], temb, groups), TResnet(ch[1], ch[1], temb, groups)]
        )
        mid.attentions = tnn.ModuleList(
            [TTransformer2D(ch[1], heads, ch[1] // heads, ctx_dim, groups)]
        )
        self.mid_block = mid

        up0 = tnn.Module()
        # diffusers skip rule: the LAST resnet of an up block takes the next
        # level's channels (the downsampler output), not this level's.
        up0.resnets = tnn.ModuleList(
            [TResnet(ch[1] * 2, ch[1], temb, groups), TResnet(ch[1] + ch[0], ch[1], temb, groups)]
        )
        up0.upsamplers = tnn.ModuleList([TUpsample(ch[1])])
        up1 = tnn.Module()
        up1.resnets = tnn.ModuleList(
            [TResnet(ch[1] + ch[0], ch[0], temb, groups), TResnet(ch[0] * 2, ch[0], temb, groups)]
        )
        up1.attentions = tnn.ModuleList(
            [
                TTransformer2D(ch[0], heads, ch[0] // heads, ctx_dim, groups),
                TTransformer2D(ch[0], heads, ch[0] // heads, ctx_dim, groups),
            ]
        )
        self.up_blocks = tnn.ModuleList([up0, up1])

        self.conv_norm_out = tnn.GroupNorm(groups, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], 4, 3, padding=1)

    def forward(self, x, timesteps, ctx):
        temb = self.time_embedding(sinusoid(timesteps, self.ch[0]))
        h = self.conv_in(x)
        skips = [h]
        # down 0: resnet -> attn -> downsample
        h = self.down_blocks[0].resnets[0](h, temb)
        h = self.down_blocks[0].attentions[0](h, ctx)
        skips.append(h)
        h = self.down_blocks[0].downsamplers[0](h)
        skips.append(h)
        # down 1 (plain): resnet
        h = self.down_blocks[1].resnets[0](h, temb)
        skips.append(h)
        # mid
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        # up 0 (plain): 2 resnets + upsample
        for j in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = self.up_blocks[0].resnets[j](h, temb)
        h = self.up_blocks[0].upsamplers[0](h)
        # up 1 (cross-attn): 2 (resnet + attn)
        for j in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = self.up_blocks[1].resnets[j](h, temb)
            h = self.up_blocks[1].attentions[j](h, ctx)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

TINY_UNET = dict(
    block_out_channels=(8, 16),
    layers_per_block=1,
    down_block_types=("CrossAttnDownBlock", "DownBlock"),
    up_block_types=("UpBlock", "CrossAttnUpBlock"),
    num_attention_heads=2,
    cross_attention_dim=12,
    norm_num_groups=4,
)


@pytest.mark.slow
def test_reference_unet_converter_oracle():
    torch.manual_seed(0)
    oracle = TUNet2D().eval()

    cfg = UNetConfig(**TINY_UNET)
    model = ReferenceNet(cfg)
    b, hw = 2, 16
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, hw, hw, 4)).astype(np.float32)
    ctx = rng.normal(size=(b, 4, 12)).astype(np.float32)
    t = np.array([3.0, 11.0], np.float32)

    init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )
    params, report = cv.convert_reference_unet(oracle.state_dict(), init)
    assert not report["missing_in_ckpt"], report["missing_in_ckpt"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]
    assert not report["unmapped_ckpt_keys"], report["unmapped_ckpt_keys"][:10]
    assert not report["unused_ckpt"], report["unused_ckpt"][:10]

    got, _ = jax.jit(model.apply)(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
        )
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


class TVAEAttn(tnn.Module):
    """diffusers VAE mid attention (single head, biased projections)."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        scores = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), dim=-1)
        out = self.to_out[0](scores @ v)
        return x + out.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class TVAE(tnn.Module):
    """Tiny diffusers AutoencoderKL replica: 2 levels, 1 layer/block."""

    def __init__(self, ch=(8, 16), latent=4, groups=4):
        super().__init__()
        enc = tnn.Module()
        enc.conv_in = tnn.Conv2d(3, ch[0], 3, padding=1)
        d0, d1 = tnn.Module(), tnn.Module()
        d0.resnets = tnn.ModuleList([TResnet(ch[0], ch[0], None, groups, eps=1e-6)])
        d0.downsamplers = tnn.ModuleList([tnn.Module()])
        d0.downsamplers[0].conv = tnn.Conv2d(ch[0], ch[0], 3, stride=2, padding=0)
        d1.resnets = tnn.ModuleList([TResnet(ch[0], ch[1], None, groups, eps=1e-6)])
        enc.down_blocks = tnn.ModuleList([d0, d1])
        enc.mid_block = tnn.Module()
        enc.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch[1], ch[1], None, groups, eps=1e-6) for _ in range(2)]
        )
        enc.mid_block.attentions = tnn.ModuleList([TVAEAttn(ch[1], groups)])
        enc.conv_norm_out = tnn.GroupNorm(groups, ch[1], eps=1e-6)
        enc.conv_out = tnn.Conv2d(ch[1], 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)

        self.post_quant_conv = tnn.Conv2d(latent, latent, 1)
        dec = tnn.Module()
        dec.conv_in = tnn.Conv2d(latent, ch[1], 3, padding=1)
        dec.mid_block = tnn.Module()
        dec.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch[1], ch[1], None, groups, eps=1e-6) for _ in range(2)]
        )
        dec.mid_block.attentions = tnn.ModuleList([TVAEAttn(ch[1], groups)])
        u0, u1 = tnn.Module(), tnn.Module()
        u0.resnets = tnn.ModuleList(
            [TResnet(ch[1], ch[1], None, groups, eps=1e-6) for _ in range(2)]
        )
        u0.upsamplers = tnn.ModuleList([TUpsample(ch[1])])
        u1.resnets = tnn.ModuleList(
            [
                TResnet(ch[1], ch[0], None, groups, eps=1e-6),
                TResnet(ch[0], ch[0], None, groups, eps=1e-6),
            ]
        )
        dec.up_blocks = tnn.ModuleList([u0, u1])
        dec.conv_norm_out = tnn.GroupNorm(groups, ch[0], eps=1e-6)
        dec.conv_out = tnn.Conv2d(ch[0], 3, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        h = e.down_blocks[0].resnets[0](h)
        h = F.pad(h, (0, 1, 0, 1))
        h = e.down_blocks[0].downsamplers[0].conv(h)
        h = e.down_blocks[1].resnets[0](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for j in range(2):
            h = d.up_blocks[0].resnets[j](h)
        h = d.up_blocks[0].upsamplers[0](h)
        for j in range(2):
            h = d.up_blocks[1].resnets[j](h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


@pytest.mark.slow
def test_vae_converter_oracle():
    torch.manual_seed(1)
    oracle = TVAE().eval()

    cfg = VAEConfig(
        block_out_channels=(8, 16),
        layers_per_block=1,
        latent_channels=4,
        norm_num_groups=4,
    )
    model = AutoencoderKL(cfg)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)

    init = jax.jit(lambda k, a: model.init(k, a))(
        jax.random.PRNGKey(0), jnp.asarray(x)
    )
    params, report = cv.convert_vae(oracle.state_dict(), init)
    assert not report["missing_in_ckpt"], report["missing_in_ckpt"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:10]
    assert not report["unmapped_ckpt_keys"], report["unmapped_ckpt_keys"][:10]
    assert not report["unused_ckpt"], report["unused_ckpt"][:10]

    got_m, got_lv = jax.jit(
        lambda p, a: model.apply(p, a, method=model.encode_moments)
    )(params, jnp.asarray(x))
    with torch.no_grad():
        moments = oracle.encode_moments(torch.from_numpy(x).permute(0, 3, 1, 2))
    want_m, want_lv = moments.chunk(2, dim=1)
    np.testing.assert_allclose(
        np.asarray(got_m), want_m.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_lv), want_lv.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )

    z = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    sf = cfg.scaling_factor
    got_px = jax.jit(lambda p, a: model.apply(p, a, method=model.decode))(
        params, jnp.asarray(z) * sf
    )
    with torch.no_grad():
        want_px = oracle.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(got_px), want_px.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )


def test_load_guard_rejects_half_loaded_checkpoint(tmp_path):
    """load_pretrained_params(min_loaded_fraction=...) must exit non-zero on
    a found-but-wrong-layout checkpoint (VERDICT: silently half-loaded
    checkpoints produced garbage with rc=0)."""
    from hallo_tpu.convert.load_pretrained import load_pretrained_params

    torch.manual_seed(3)
    oracle = TVAE()
    sd = {  # rename half the keys so they fail to map
        (k if i % 2 else "bogus." + k): v
        for i, (k, v) in enumerate(oracle.state_dict().items())
    }
    vae_dir = tmp_path / "vae"
    vae_dir.mkdir()
    torch.save(sd, vae_dir / "diffusion_pytorch_model.bin")

    cfg = VAEConfig(
        block_out_channels=(8, 16), layers_per_block=1,
        latent_channels=4, norm_num_groups=4,
    )
    model = AutoencoderKL(cfg)
    init = jax.jit(lambda k, a: model.init(k, a))(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )
    with pytest.raises(RuntimeError, match="load incomplete"):
        load_pretrained_params(
            {"vae": init}, vae_model_path=str(vae_dir), min_loaded_fraction=0.99
        )
    # permissive mode still returns params
    out = load_pretrained_params(
        {"vae": init}, vae_model_path=str(vae_dir), min_loaded_fraction=0.0
    )
    assert "vae" in out


def test_converter_fails_on_transposed_weight():
    """A deliberately wrong-layout checkpoint must NOT silently load: the
    converter's shape check reports it (and strict mode raises)."""
    torch.manual_seed(2)
    oracle = TVAE()
    sd = oracle.state_dict()
    # corrupt one conv: swap O and I (16 vs 8) — conversion must flag it
    sd["decoder.up_blocks.1.resnets.0.conv1.weight"] = sd[
        "decoder.up_blocks.1.resnets.0.conv1.weight"
    ].permute(1, 0, 2, 3)

    cfg = VAEConfig(
        block_out_channels=(8, 16),
        layers_per_block=1,
        latent_channels=4,
        norm_num_groups=4,
    )
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    init = jax.jit(lambda k, a: model.init(k, a))(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="shape mismatch"):
        cv.convert_vae(sd, init, strict=True)
    _, report = cv.convert_vae(sd, init, strict=False)
    assert report["shape_mismatch"] == [
        "decoder/up_1_resnets_0/conv1/Conv_0/kernel"
    ]
