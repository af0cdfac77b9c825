"""Numerics tests for core layers against PyTorch (CPU) as an independent
oracle — the rebuild's replacement for the reference's absent unit tests
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hallo_tpu.models import layers


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    scale = rng.normal(size=(32,)).astype(np.float32)
    bias = rng.normal(size=(32,)).astype(np.float32)

    got = layers.group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 4, 1e-5)

    gn = torch.nn.GroupNorm(4, 32, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        # NHWC -> NCHW
        want = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_group_norm_bf16_affine_close_to_f32():
    # The default normalize pass applies the per-(B, C) affine in the
    # compute dtype (no f32 copy of the big tensor — see layers.group_norm
    # perf note). Pin that the bf16 rounding stays small even with a
    # non-zero activation mean (the x*a+b cancellation case) and that the
    # f32 path is bit-identical to the legacy math.
    rng = np.random.default_rng(7)
    x = (rng.normal(size=(2, 16, 16, 64)) * 2.0 + 5.0).astype(np.float32)
    scale = rng.normal(size=(64,)).astype(np.float32)
    bias = rng.normal(size=(64,)).astype(np.float32)

    ref = np.asarray(
        layers.group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 8, 1e-5)
    )
    got = np.asarray(
        layers.group_norm(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(scale), jnp.asarray(bias), 8, 1e-5
        ).astype(jnp.float32)
    )
    # Output is O(|scale|) ~ O(1); bf16 input quantization alone costs
    # ~0.4% relative. Allow a small absolute envelope over that.
    err = np.abs(got - ref)
    assert err.max() < 0.15, err.max()
    assert err.mean() < 0.02, err.mean()


def test_layer_norm_bf16_large_mean():
    # LayerNorm's default path uses one-pass E[x^2]-E[x]^2 f32 variance
    # (unlike group_norm, the ESTIMATOR changed, not just the affine dtype)
    # which is cancellation-prone for large-mean activations. Pin the
    # accuracy envelope on both a large-mean f32 input and a bf16 input
    # (ADVICE r4: layers.py LayerNorm).
    rng = np.random.default_rng(11)
    # |mean| = 40, std = 2: E[x^2] ~ 1604 vs var 4 — worst realistic
    # cancellation for this model's activation scales.
    x = (rng.normal(size=(4, 33, 320)) * 2.0 + 40.0).astype(np.float32)
    scale = rng.normal(size=(320,)).astype(np.float32)
    bias = rng.normal(size=(320,)).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}

    x64 = x.astype(np.float64)
    mean = x64.mean(-1, keepdims=True)
    var = ((x64 - mean) ** 2).mean(-1, keepdims=True)
    want = ((x64 - mean) / np.sqrt(var + 1e-5) * scale + bias).astype(np.float32)

    got32 = np.asarray(layers.LayerNorm().apply(params, jnp.asarray(x)))
    err32 = np.abs(got32 - want)
    assert err32.max() < 5e-3, err32.max()  # one-pass f32 on mean=40 input

    got_bf = np.asarray(
        layers.LayerNorm(dtype=jnp.bfloat16)
        .apply(params, jnp.asarray(x, jnp.bfloat16))
        .astype(jnp.float32)
    )
    errbf = np.abs(got_bf - want)
    # bf16 input quantization of a mean-40 input alone costs ~0.3%
    # relative of |x| -> O(0.1) after the ~/2 normalize; affine |scale|~1.
    assert errbf.max() < 0.35, errbf.max()
    assert errbf.mean() < 0.05, errbf.mean()


def test_inflated_group_norm_spans_frames():
    # Stats over (F, H, W) jointly: reshaping (B,F,H,W,C)->(B,F*H,W,C) must
    # give the same result (reference InflatedGroupNorm, resnet.py:69-101).
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 8, 8, 32)).astype(np.float32)
    scale = np.ones((32,), np.float32)
    bias = np.zeros((32,), np.float32)
    a = layers.group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 8, 1e-5)
    b = layers.group_norm(
        jnp.asarray(x.reshape(2, 32, 8, 32)), jnp.asarray(scale), jnp.asarray(bias), 8, 1e-5
    ).reshape(2, 4, 8, 8, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 7, 16)).astype(np.float32)
    ln = layers.LayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = ln.apply(params, jnp.asarray(x))

    tln = torch.nn.LayerNorm(16, eps=1e-5)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(scale))
        tln.bias.copy_(torch.from_numpy(bias))
        want = tln(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_feedforward_geglu_matches_torch():
    rng = np.random.default_rng(3)
    dim = 8
    x = rng.normal(size=(2, 5, dim)).astype(np.float32)
    ff = layers.FeedForward(dim)
    params = ff.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = ff.apply(params, jnp.asarray(x))

    w1 = np.asarray(params["params"]["proj_in"]["Dense_0"]["kernel"])
    b1 = np.asarray(params["params"]["proj_in"]["Dense_0"]["bias"])
    w2 = np.asarray(params["params"]["proj_out"]["Dense_0"]["kernel"])
    b2 = np.asarray(params["params"]["proj_out"]["Dense_0"]["bias"])
    xt = torch.from_numpy(x)
    proj = xt @ torch.from_numpy(w1) + torch.from_numpy(b1)
    value, gate = proj.chunk(2, dim=-1)
    hidden = value * torch.nn.functional.gelu(gate)
    want = (hidden @ torch.from_numpy(w2) + torch.from_numpy(b2)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_attention_matches_torch_sdpa():
    rng = np.random.default_rng(4)
    b, lq, lk, h, d = 2, 6, 9, 4, 16
    q = rng.normal(size=(b, h, lq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, lk, d)).astype(np.float32)

    from hallo_tpu.ops.attention import dot_product_attention

    got = dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), backend="xla"
    )
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_attention_bias_masks_ref_tokens():
    # Masking the ref-token region with NEG_INF must equal attention over
    # only the self tokens (the CFG-uncond trick,
    # mutual_self_attention.py:264-284).
    rng = np.random.default_rng(5)
    b, l, lr, h, d = 2, 5, 3, 2, 8
    q = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    k_self = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    k_ref = jnp.asarray(rng.normal(size=(b, h, lr, d)).astype(np.float32))
    v_self = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    v_ref = jnp.asarray(rng.normal(size=(b, h, lr, d)).astype(np.float32))

    from hallo_tpu.models.attention_blocks import NEG_INF
    from hallo_tpu.ops.attention import dot_product_attention

    k = jnp.concatenate([k_self, k_ref], axis=2)
    v = jnp.concatenate([v_self, v_ref], axis=2)
    bias = jnp.concatenate(
        [jnp.zeros((b, 1, 1, l)), jnp.full((b, 1, 1, lr), NEG_INF)], axis=-1
    )
    masked = dot_product_attention(q, k, v, bias=bias, backend="xla")
    plain = dot_product_attention(q, k_self, v_self, backend="xla")
    np.testing.assert_allclose(np.asarray(masked), np.asarray(plain), atol=1e-5)


def test_timestep_embedding_flip():
    emb = layers.timestep_embedding(jnp.asarray([0.0, 10.0]), 8)
    assert emb.shape == (2, 8)
    # t=0: cos->1, sin->0 with flip_sin_to_cos (cos first).
    np.testing.assert_allclose(np.asarray(emb[0, :4]), np.ones(4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), np.zeros(4), atol=1e-6)


def test_sinusoidal_positions_matches_reference_formula():
    pe = np.asarray(layers.sinusoidal_positions(24, 8))
    position = np.arange(24)[:, None]
    div = np.exp(np.arange(0, 8, 2) * (-np.log(10000.0) / 8))
    np.testing.assert_allclose(pe[:, 0::2], np.sin(position * div), atol=1e-6)
    np.testing.assert_allclose(pe[:, 1::2], np.cos(position * div), atol=1e-6)
