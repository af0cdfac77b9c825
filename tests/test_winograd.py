"""Winograd F(2,3) conv kernel: interpret-mode parity vs the XLA direct
conv oracle, eligibility rules, and the custom-vjp gradients.

The kernel is a measured perf dead end on v5e (see pallas_winograd.py
docstring) and ships gated OFF; these tests keep its numerics pinned.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hallo_tpu.ops.pallas_winograd import (
    conv3x3_direct,
    winograd_conv3x3,
    winograd_conv3x3_vjp,
    winograd_eligible,
)


@pytest.mark.parametrize(
    "shape,cout",
    [((2, 16, 64, 320), 320), ((2, 64, 64, 320), 320), ((1, 32, 32, 640), 640)],
)
def test_winograd_matches_direct(shape, cout):
    kx, kw = jax.random.split(jax.random.PRNGKey(sum(shape)))
    x = jax.random.normal(kx, shape, jnp.float32)
    k = jax.random.normal(kw, (3, 3, shape[-1], cout), jnp.float32) / 30
    bias = jnp.linspace(-1, 1, cout)
    assert winograd_eligible(shape, k.shape, (1, 1), 1)
    got = winograd_conv3x3(x, k, bias, interpret=True)
    want = conv3x3_direct(x, k, bias)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 1e-5, rel


def test_winograd_eligibility_rules():
    k = (3, 3, 320, 320)
    assert not winograd_eligible((2, 16, 14, 320), k, (1, 1), 1)  # odd W
    assert not winograd_eligible((2, 16, 64, 320), k, (2, 2), 1)  # strided
    assert not winograd_eligible((2, 18, 64, 320), k, (1, 1), 1)  # H % 2TR
    assert not winograd_eligible(
        (2, 64, 64, 960), (3, 3, 960, 320), (1, 1), 1
    )  # U block over VMEM budget with indivisible co tile


def test_winograd_vjp_matches_direct_grads():
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (1, 16, 64, 64), jnp.float32)
    k = jax.random.normal(kw, (3, 3, 64, 64), jnp.float32) / 10
    bias = jnp.zeros((64,), jnp.float32)

    def loss_w(x, k, b):
        return jnp.sum(jnp.square(winograd_conv3x3_vjp(x, k, b)))

    def loss_d(x, k, b):
        return jnp.sum(jnp.square(conv3x3_direct(x, k, b)))

    # forward of the vjp-wrapped op runs the pallas kernel -> interpret only
    # on CPU; compare grads via the custom backward against XLA autodiff.
    gw = jax.grad(
        lambda x, k, b: jnp.sum(
            jnp.square(winograd_conv3x3(x, k, b, interpret=True))
        ),
        argnums=(0, 1, 2),
    )
    import functools

    from hallo_tpu.ops import pallas_winograd as pw

    dx, dk, db = pw._wino_bwd(
        (x, k),
        2 * winograd_conv3x3(x, k, bias, interpret=True),
    )
    wx, wk, wb = jax.grad(loss_d, argnums=(0, 1, 2))(x, k, bias)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(wx), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(wk), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(wb), atol=2e-3, rtol=1e-3)
