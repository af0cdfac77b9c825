"""Mid-graph layout anchor.

XLA assigns physical layouts by propagation: one op with a transposed
operand/result layout (e.g. a custom-call kernel whose HBM format is
site-major) can drag a whole downstream chain of matmuls into L-minor
layouts — measured on the 512² denoiser step as ~3 ms per affected Dense
(48 GF/s HBM-bound writes) plus explicit relayout copies.

JAX has no mid-graph layout annotation, but a Pallas custom call's
`operand_layout_constraints` are honored absolutely: an identity-copy
kernel with natural (row-major) blocks forces the transposed layout to be
resolved HERE, once, by a single dedicated copy (~0.2-0.4 ms per 84 MB at
512²) instead of inside every downstream fusion.

MEASURED (r1, 512² denoiser step): anchoring the temporal-attention output
came out 13 ms/step SLOWER (511 vs 498) — the anchor copies cost more than
the L-minor penalties they removed there. The op is kept for future spots
where a profile shows a longer polluted chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def layout_anchor(x: jax.Array, block_rows: int = 1024) -> jax.Array:
    """Identity whose input AND output are constrained to the natural
    (minor = last axis) layout. No-op on CPU-style backends: the cost is a
    VMEM-speed copy; the win is keeping downstream matmuls C-minor."""
    if x.ndim < 2:
        return x
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    m, c = x2.shape
    bm = min(block_rows, m)
    while m % bm:  # largest divisor of m at most block_rows
        bm -= 1
    grid = (m // bm,)
    out = pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
    )(x2)
    return out.reshape(shape)
