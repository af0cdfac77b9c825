"""8-bit AdamW (train/adam8bit.py — bnb.optim.AdamW8bit equivalent,
reference stage2.yaml:37): quantization roundtrip, optimizer trajectory vs
fp32 optax.adamw, int8 state dtypes, and make_optimizer wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hallo_tpu.train.adam8bit import (
    _dequantize, _quantize, adamw_8bit, scale_by_adam_8bit,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32) * 3.0)
    qs = _quantize(x, 256)
    assert qs.q.dtype == jnp.int8 and qs.scales.shape == (4,)
    back = _dequantize(qs, x.shape, 256)
    # absmax/127 per block bounds the error at half a quantization step
    err = np.abs(np.asarray(back - x))
    bound = np.asarray(qs.scales).max() / 2 + 1e-7
    assert err.max() <= bound


def test_small_leaves_stay_fp32():
    x = jnp.arange(10, dtype=jnp.float32)
    qs = _quantize(x, 256)
    assert qs.q.dtype == jnp.float32
    np.testing.assert_array_equal(_dequantize(qs, x.shape, 256), x)


def test_trajectory_tracks_fp32_adamw():
    """Minimize a quadratic: the 8-bit trajectory must track fp32 AdamW
    closely and reach the same optimum."""
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.normal(size=(512,)).astype(np.float32))
    p0 = {"w": jnp.zeros(512), "b": jnp.zeros(4)}  # b: small-leaf passthrough

    def loss(p):
        return jnp.sum((p["w"] - target) ** 2) + jnp.sum(p["b"] ** 2)

    def run(tx, steps=60):
        p = p0
        s = tx.init(p)

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p)
            u, s2 = tx.update(g, s, p)
            return optax.apply_updates(p, u), s2

        mid = None
        for i in range(steps):
            p, s = step(p, s)
            if i == 9:
                mid = p
        return p, mid

    lr, wd = 0.05, 1e-3
    p_ref, mid_ref = run(optax.adamw(lr, weight_decay=wd))
    p_8bit, mid_8bit = run(adamw_8bit(lr, weight_decay=wd))
    # The descent phase must track fp32 closely; near the optimum Adam
    # oscillates and tiny moment perturbations shift the phase (same
    # behavior as bitsandbytes), so the END state is held to the achieved
    # LOSS, not elementwise equality.
    mid_err = np.abs(np.asarray(mid_8bit["w"]) - np.asarray(mid_ref["w"]))
    assert mid_err.mean() < 0.02 and mid_err.max() < 0.12, (
        mid_err.mean(), mid_err.max(),
    )
    assert float(loss(p_8bit)) < 0.01 * float(loss(p0))
    assert float(loss(p_8bit)) < 2.0 * float(loss(p_ref)) + 1e-3


def test_state_is_int8():
    p = {"w": jnp.zeros((64, 64))}
    tx = scale_by_adam_8bit()
    s = tx.init(p)
    assert s.mu["w"].q.dtype == jnp.int8
    assert s.nu["w"].q.dtype == jnp.int8
    # moments cost ~1 byte/param + 4/block for scales vs 8 bytes fp32
    n = 64 * 64
    int8_bytes = 2 * (n + 4 * (n // 256))
    assert int8_bytes < 0.3 * (2 * 4 * n)


def test_make_optimizer_8bit_with_frozen_labels():
    from hallo_tpu.train.state import OptimizerConfig, make_optimizer

    params = {"a": {"kernel": jnp.ones((300, 4))}, "b": {"kernel": jnp.ones(3)}}
    labels = {"a": {"kernel": "train"}, "b": {"kernel": "freeze"}}
    tx = make_optimizer(OptimizerConfig(use_8bit_adam=True), labels)
    s = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = jax.jit(tx.update)(g, s, params)
    assert float(jnp.abs(u["a"]["kernel"]).sum()) > 0
    assert float(jnp.abs(u["b"]["kernel"]).sum()) == 0  # frozen masked
