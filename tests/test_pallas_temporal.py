"""Fused temporal-attention kernel vs the XLA formulation (interpret mode).

The motion module's frame-axis attention (reference motion_module.py:579-607)
runs through hallo_tpu/ops/pallas_temporal.py on TPU; sites ride the lane
axis so the 18x18 per-site problem never touches HBM or the MXU floor."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from hallo_tpu.ops import pallas_temporal as pt


def _check(b, f, heads, d, l, block_l=512, dtype=np.float32):
    rng = np.random.default_rng(f + d + l)
    c = heads * d
    q = rng.normal(size=(b, f, c, l)).astype(dtype)
    k = rng.normal(size=(b, f, c, l)).astype(dtype)
    v = rng.normal(size=(b, f, c, l)).astype(dtype)
    with pltpu.force_tpu_interpret_mode():
        got = pt.temporal_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            heads=heads, block_l=block_l,
        )
    want = pt._xla_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads, float(d) ** -0.5
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_temporal_level0_shape():
    _check(1, 6, 2, 8, 256, block_l=128)


def test_temporal_ragged_sites_padding():
    _check(2, 5, 2, 16, 200, block_l=128)  # L not a lane multiple


def test_temporal_grad_matches_xla():
    rng = np.random.default_rng(7)
    b, f, heads, d, l = 1, 4, 2, 8, 128
    c = heads * d
    q = jnp.asarray(rng.normal(size=(b, f, c, l)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, f, c, l)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, f, c, l)).astype(np.float32))

    def loss_kernel(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(pt.temporal_attention(q, k, v, heads=heads) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(pt._xla_reference(q, k, v, heads, float(d) ** -0.5) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_temporal_packed_natural_vs_oracle():
    """Natural-layout (B, F, L, C) packed temporal kernel (heads sliced
    in VMEM) vs the einsum oracle."""
    rng = np.random.default_rng(9)
    for (b, f, heads, d, l) in [(1, 6, 2, 8, 256), (2, 5, 2, 16, 200)]:
        c = heads * d
        q = jnp.asarray(rng.normal(size=(b, f, l, c)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, f, l, c)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, f, l, c)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = pt.temporal_attention_packed(q, k, v, heads=heads, block_l=128)
        want = pt._xla_reference_natural(q, k, v, heads, float(d) ** -0.5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5,
            err_msg=str((b, f, heads, d, l)),
        )


def test_temporal_packed_grad():
    rng = np.random.default_rng(10)
    b, f, heads, d, l = 1, 4, 2, 8, 128
    c = heads * d
    q = jnp.asarray(rng.normal(size=(b, f, l, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, f, l, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, f, l, c)).astype(np.float32))

    def loss_kernel(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(
                pt.temporal_attention_packed(q, k, v, heads=heads) ** 2
            )

    def loss_ref(q, k, v):
        return jnp.sum(
            pt._xla_reference_natural(q, k, v, heads, float(d) ** -0.5) ** 2
        )

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
