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
