"""Fused nearest-2x-upsample + 3x3-conv rewrite (layers.Up2xConv).

Pins that the low-res parity-decomposed form (_FusedUp2xConv3x3 — one
(2,2,C,4F) conv + interleave) is the SAME function as the naive
`jnp.repeat x2 -> 3x3 conv` (reference resnet.py:104-185 semantics):
identical param tree, matching outputs (f32, tolerance only for the
reassociated tap sums), gradients flow, and odd content (not just border)
exercises every parity class.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hallo_tpu.models.layers import Up2xConv


def _run(x, features, fused: bool, params=None):
    os.environ["HALLO_FUSED_UPSAMPLE"] = "1" if fused else "0"
    try:
        mod = Up2xConv(features, dtype=jnp.float32)
        if params is None:
            params = mod.init(jax.random.PRNGKey(0), x)
        return params, mod.apply(params, x)
    finally:
        os.environ.pop("HALLO_FUSED_UPSAMPLE", None)


@pytest.mark.parametrize("shape,features", [((2, 5, 7, 6), 4), ((1, 8, 8, 3), 3)])
def test_fused_matches_naive(shape, features):
    x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    params, ref = _run(x, features, fused=False)
    params2, out = _run(x, features, fused=True, params=params)
    assert out.shape == ref.shape == shape[:1] + (
        2 * shape[1], 2 * shape[2], features)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_param_trees_identical():
    x = jnp.zeros((1, 4, 4, 5), jnp.float32)
    p_naive, _ = _run(x, 7, fused=False)
    p_fused, _ = _run(x, 7, fused=True)
    flat_n = jax.tree_util.tree_map_with_path(lambda k, v: (k, v.shape), p_naive)
    flat_f = jax.tree_util.tree_map_with_path(lambda k, v: (k, v.shape), p_fused)
    assert jax.tree_util.tree_structure(p_naive) == \
        jax.tree_util.tree_structure(p_fused)
    assert jax.tree.leaves(flat_n) == jax.tree.leaves(flat_f)


def test_fused_gradients_match_naive():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 6, 3), jnp.float32)
    params, _ = _run(x, 4, fused=False)

    def loss(p, fused):
        os.environ["HALLO_FUSED_UPSAMPLE"] = "1" if fused else "0"
        try:
            y = Up2xConv(4, dtype=jnp.float32).apply(p, x)
        finally:
            os.environ.pop("HALLO_FUSED_UPSAMPLE", None)
        return jnp.sum(jnp.sin(y))

    g_naive = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_naive), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)
