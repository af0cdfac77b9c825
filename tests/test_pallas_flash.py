"""Pallas flash-attention kernel vs the XLA formulation (interpret mode on
CPU; the same kernel compiles via Mosaic on real TPU — exercised by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from hallo_tpu.ops.attention import _xla_attention
from hallo_tpu.ops import pallas_flash


def _run(q, k, v, bias=None, **kw):
    with pltpu.force_tpu_interpret_mode():
        return pallas_flash.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            bias=None if bias is None else jnp.asarray(bias), **kw
        )


def _ref(q, k, v, bias=None):
    b4 = None
    if bias is not None:
        b4 = jnp.asarray(bias).reshape(bias.shape[0], 1, 1, -1)
    return _xla_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), b4,
        float(q.shape[-1]) ** -0.5,
    )


def test_flash_matches_xla_basic():
    rng = np.random.default_rng(0)
    b, lq, lk, h, d = 2, 256, 256, 2, 64
    q = rng.normal(size=(b, h, lq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    got = np.asarray(_run(q, k, v, block_q=128, block_k=128))
    want = np.asarray(_ref(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_non_multiple_lengths_and_bias():
    rng = np.random.default_rng(1)
    b, lq, lk, h, d = 2, 100, 150, 2, 40  # ragged lengths, SD head_dim 40
    q = rng.normal(size=(b, h, lq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    # mask the last 50 keys for batch entry 0 (the CFG-uncond ref masking)
    bias = np.zeros((b, lk), np.float32)
    bias[0, 100:] = -1e9
    got = np.asarray(_run(q, k, v, bias, block_q=128, block_k=128))
    want = np.asarray(_ref(q, k, v, bias))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_small_kv_audio_layout():
    # audio cross-attention: 32 kv tokens, large q
    rng = np.random.default_rng(2)
    b, lq, lk, h, d = 2, 256, 32, 2, 40
    q = rng.normal(size=(b, h, lq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    got = np.asarray(_run(q, k, v, block_q=128, block_k=128))
    want = np.asarray(_ref(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_grad_matches_xla():
    rng = np.random.default_rng(3)
    b, lq, lk, h, d = 1, 128, 128, 1, 32
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)).astype(np.float32))

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(pallas_flash.flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_straight_vs_transposed_paths():
    """Both kernel domains must agree with the oracle: the transposed-PV
    domain is auto-selected for d % 128 != 0 (SD-1.5 head dims 40/80/160),
    the straight one for lane-multiple head dims."""
    rng = np.random.default_rng(4)
    from hallo_tpu.ops.pallas_flash import _flash_forward, _flash_forward_t

    b, lq, lk, h = 2, 130, 260, 2
    for d in (40, 128):
        q = rng.normal(size=(b, h, lq, d)).astype(np.float32)
        k = rng.normal(size=(b, h, lk, d)).astype(np.float32)
        v = rng.normal(size=(b, h, lk, d)).astype(np.float32)
        bias = np.zeros((b, lk), np.float32)
        bias[1, 200:] = -1e9
        want = np.asarray(_ref(q, k, v, bias))
        for fwd in (_flash_forward, _flash_forward_t):
            with pltpu.force_tpu_interpret_mode():
                got = fwd(
                    jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                    jnp.asarray(bias), float(d) ** -0.5, 128, 128,
                )
            np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_flash_int8_scores_close_to_oracle():
    """int8 QK^T (quant="int8", transposed domain): scores carry quantization
    error, so parity is statistical — relative Frobenius error under 1% and
    max elementwise error well under bf16-scale."""
    from hallo_tpu.ops.pallas_flash import _flash_forward_t_q8, _xla_reference

    rng = np.random.default_rng(11)
    b, h, lq, lk, d = 2, 2, 256, 1024, 40
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    scale = d ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = _flash_forward_t_q8(q, k, v, None, scale, 256, 512)
    want = _xla_reference(q, k, v, None, scale)
    g = np.asarray(got, np.float64)
    w = np.asarray(want, np.float64)
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    assert rel < 0.01, rel
    assert np.max(np.abs(g - w)) < 0.08, np.max(np.abs(g - w))


def test_flash_int8_with_bias_mask():
    """The CFG-uncond per-key bias path composes with int8 scores."""
    from hallo_tpu.ops.pallas_flash import _flash_forward_t_q8, _xla_reference

    rng = np.random.default_rng(12)
    b, h, lq, lk, d = 1, 2, 128, 512, 40
    q = jnp.asarray(rng.normal(size=(b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lk, d)), jnp.float32)
    bias = jnp.where(jnp.arange(lk)[None, :] >= 256, -1e9, 0.0).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (b, lk))
    scale = d ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = _flash_forward_t_q8(q, k, v, bias, scale, 128, 256)
    want = _xla_reference(q, k, v, bias, scale)
    g = np.asarray(got, np.float64)
    w = np.asarray(want, np.float64)
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    assert rel < 0.01, rel


def test_flash_packed_all_heads_vs_oracle():
    """All-heads-resident packed kernel (natural (B, L, C) I/O) vs oracle,
    with and without the per-key bias, at several head counts."""
    from hallo_tpu.ops.pallas_flash import (
        _xla_reference_packed,
        flash_attention_packed,
    )

    rng = np.random.default_rng(3)
    for (b, lq, lk, heads, d, bias_on) in [
        (2, 256, 1024, 2, 40, False),
        (1, 200, 512, 4, 40, True),
        (1, 256, 256, 2, 80, False),
        (1, 256, 32, 2, 40, False),  # short-KV (audio tokens) padding path
    ]:
        c = heads * d
        q = jnp.asarray(rng.normal(size=(b, lq, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)
        bias = None
        if bias_on:
            bias = jnp.where(jnp.arange(lk)[None, :] >= lk // 2, -1e9, 0.0)
            bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, lk))
        with pltpu.force_tpu_interpret_mode():
            got = flash_attention_packed(
                q, k, v, heads=heads, bias=bias, block_q=128, block_k=256
            )
        want = _xla_reference_packed(q, k, v, bias, heads, d ** -0.5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5,
            err_msg=str((b, lq, lk, heads, d, bias_on)),
        )


def test_flash_packed_grad_matches_oracle():
    from hallo_tpu.ops.pallas_flash import (
        _xla_reference_packed,
        flash_attention_packed,
    )

    rng = np.random.default_rng(4)
    b, lq, lk, heads, d = 1, 128, 256, 2, 40
    c = heads * d
    q = jnp.asarray(rng.normal(size=(b, lq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(
            flash_attention_packed(
                q, k, v, heads=heads, block_q=128, block_k=128
            ) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference_packed(q, k, v, None, heads, d ** -0.5) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_flash_packed_pallas_backward_vs_oracle():
    """Handwritten Pallas backward (dq/dk/dv from the saved base-2 lse,
    no scores in HBM) vs the XLA-vjp oracle — incl. per-key bias, kv
    padding, and d=80. The bias cotangent is intentionally zero in the
    Pallas path (constant masks only); compare only dq/dk/dv."""
    import os

    from hallo_tpu.ops.pallas_flash import (
        _xla_reference_packed,
        flash_attention_packed,
    )

    rng = np.random.default_rng(13)
    for (b, lq, lk, heads, d, bias_on) in [
        (1, 128, 256, 2, 40, False),
        (1, 200, 320, 2, 40, True),   # non-multiple lengths + bias mask
        (1, 128, 128, 2, 80, False),
        (2, 128, 32, 2, 40, False),   # short KV (audio) padding path
    ]:
        c = heads * d
        q = jnp.asarray(rng.normal(size=(b, lq, c)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(b, lq, c)), jnp.float32)
        bias = None
        if bias_on:
            bias = jnp.where(jnp.arange(lk)[None, :] >= lk // 2, -1e9, 0.0)
            bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, lk))

        def loss_kernel(q, k, v):
            out = flash_attention_packed(
                q, k, v, heads=heads, bias=bias, block_q=128, block_k=128
            )
            return jnp.sum(out * w)

        def loss_ref(q, k, v):
            return jnp.sum(
                _xla_reference_packed(q, k, v, bias, heads, d ** -0.5) * w
            )

        assert os.environ.get("HALLO_FLASH_BWD", "pallas") == "pallas"
        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("q k v".split(), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=3e-4,
                err_msg=f"d{name} {(b, lq, lk, heads, d, bias_on)}",
            )


def test_train_bwd_blocks_channel_clamp():
    """Scoped-VMEM clamp: backward blocks shrink with channel count.
    Measured: C=640 at 512x512 needs 16.28M vs the 16M limit (stage-2
    full-width step, up_blocks_2 ref-concat attention)."""
    from hallo_tpu.ops.pallas_flash import _train_bwd_blocks

    assert _train_bwd_blocks(320, 1024, 1024) == (512, 512)
    assert _train_bwd_blocks(640, 1024, 1024) == (512, 256)
    assert _train_bwd_blocks(1280, 1024, 1024) == (256, 256)
    # never widens blocks the caller already made small
    assert _train_bwd_blocks(640, 128, 128) == (128, 128)


def test_flash_packed_pallas_backward_wide_channels():
    """Backward numerics at C=640 (heads=8, d=80) with blocks large enough
    to trigger the channel-aware clamp (512 -> kv 256)."""
    from hallo_tpu.ops.pallas_flash import (
        _xla_reference_packed,
        flash_attention_packed,
    )

    rng = np.random.default_rng(7)
    b, lq, lk, heads, d = 1, 256, 512, 8, 80
    c = heads * d
    q = jnp.asarray(rng.normal(size=(b, lq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, lq, c)), jnp.float32)

    def loss_kernel(q, k, v):
        out = flash_attention_packed(
            q, k, v, heads=heads, block_q=512, block_k=512
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference_packed(q, k, v, None, heads, d ** -0.5) * w)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("q k v".split(), g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, err_msg=f"d{name}"
        )


def test_flash_packed_backward_env_fallback(monkeypatch):
    """HALLO_FLASH_BWD=xla selects the recompute path (exact dbias)."""
    from hallo_tpu.ops.pallas_flash import (
        _xla_reference_packed,
        flash_attention_packed,
    )

    monkeypatch.setenv("HALLO_FLASH_BWD", "xla")
    rng = np.random.default_rng(14)
    b, lq, lk, heads, d = 1, 128, 128, 2, 40
    c = heads * d
    q = jnp.asarray(rng.normal(size=(b, lq, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, c)), jnp.float32)

    def loss_kernel(q):
        return jnp.sum(
            flash_attention_packed(
                q, k, v, heads=heads, block_q=128, block_k=128
            ) ** 2
        )

    def loss_ref(q):
        return jnp.sum(_xla_reference_packed(q, k, v, None, heads, d ** -0.5) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel)(q)
    np.testing.assert_allclose(
        np.asarray(gk),
        np.asarray(jax.grad(loss_ref)(q)),
        atol=2e-4,
    )
