"""Fused temporal (frame-axis) attention kernel for TPU.

The motion module attends over F = 16-18 frames independently at every
spatial site (reference: hallo/models/motion_module.py:579-607 rearranges
`(b f) d c -> (b d) f c` and runs 65k tiny attentions). On TPU that
formulation is pathological — xprof on the 512^2 denoiser step measured
~100 ms across the motion modules for ~4 GFLOP of math:

- two materialized ~90 MB transposes per attention (relayout to/from the
  site-batched shape),
- batched 18x18 MXU matmuls that pay the 128-row pipeline floor at 2% use,
- an f32 (B*H*L, 18, 18) scores tensor (1.4 GB at level 0) round-tripping
  HBM through an unfused softmax.

This kernel keeps the whole per-site attention in VMEM and does the tiny
frame-axis contractions on the VPU (the MXU has nothing to offer at
18x18x40). Layout: sites on LANES, so every operation vectorizes across
128 sites at once:

  q, k, v: (B, F, C, L)  -> grid (B, H, L/block_l), block (1, F, D, block_l)
  scores s[g] = sum_d q[f]*k[g]   (sublane reduce over D)
  softmax over g in fp32 exp2 domain (scale*log2(e) folded into q)
  o[f] = sum_g p[g] * v[g]        (broadcast FMA)

Backward: recompute-based custom_vjp via the XLA formulation.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = math.log2(math.e)


def _temporal_kernel(q_ref, k_ref, v_ref, o_ref, s_scratch, *, frames: int):
    """One (batch, head, site-tile) instance: full attention over frames.
    Loops are fully unrolled with static indices (this Pallas/Mosaic version
    has no dynamic_slice lowering); frames <= 18 keeps the IR small."""
    for f in range(frames):
        qf = q_ref[0, f].astype(jnp.float32)  # (D, bl)
        for g in range(frames):
            # s[g, :] = sum_d q[f, d, :] * k[g, d, :]
            s_scratch[g] = jnp.sum(qf * k_ref[0, g].astype(jnp.float32), axis=0)
        s = s_scratch[...]  # (F, bl), fp32, pre-scaled exp2 domain
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp2(s - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)

        acc = jnp.zeros(o_ref.shape[2:], jnp.float32)  # (D, bl)
        for g in range(frames):
            acc = acc + p[g][None, :] * v_ref[0, g].astype(jnp.float32)
        o_ref[0, f] = acc.astype(o_ref.dtype)


def _temporal_forward(
    q: jax.Array,  # (B, F, C, L) with C = heads * D
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float,
    block_l: int,
) -> jax.Array:
    b, f, c, l = q.shape
    d = c // heads

    qt = (q * jnp.asarray(scale * LOG2E, q.dtype)).astype(q.dtype)

    # Site-tile size under the VMEM budget: 4 (q/k/v/o) bf16 tiles of
    # (F, D, block_l), double-buffered inputs, plus fp32 working set.
    budget_sites = (6 * 1024 * 1024) // max(f * d * 16, 1)
    block_l = min(block_l, max(128, (budget_sites // 128) * 128))
    block_l = min(block_l, max(128, l))
    pad = (-l) % block_l
    if pad:
        widths = ((0, 0), (0, 0), (0, 0), (0, pad))
        qt = jnp.pad(qt, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
    l_p = qt.shape[-1]

    grid = (b, heads, l_p // block_l)
    spec = pl.BlockSpec((1, f, d, block_l), lambda bi, hi, li: (bi, 0, hi, li))
    out = pl.pallas_call(
        functools.partial(_temporal_kernel, frames=f),
        out_shape=jax.ShapeDtypeStruct((b, f, c, l_p), v.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((f, block_l), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(qt, k, v)
    return out[..., :l]


def _xla_reference(q, k, v, heads, scale):
    b, f, c, l = q.shape
    d = c // heads
    qh = q.reshape(b, f, heads, d, l)
    kh = k.reshape(b, f, heads, d, l)
    vh = v.reshape(b, f, heads, d, l)
    s = jnp.einsum("bfhdl,bghdl->bhlfg", qh, kh, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhlfg,bghdl->bfhdl", p, vh)
    return o.reshape(b, f, c, l)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _temporal(q, k, v, heads, scale, block_l):
    return _temporal_forward(q, k, v, heads, scale, block_l)


def _temporal_fwd(q, k, v, heads, scale, block_l):
    return _temporal_forward(q, k, v, heads, scale, block_l), (q, k, v)


def _temporal_bwd(heads, scale, block_l, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference(q, k, v, heads, scale), q, k, v
    )
    return vjp(g)


_temporal.defvjp(_temporal_fwd, _temporal_bwd)


def temporal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    heads: int,
    scale: Optional[float] = None,
    block_l: int = 512,
) -> jax.Array:
    """Frame-axis attention at every site. q/k/v: (B, F, C, L), C = H*D.
    Returns (B, F, C, L)."""
    d = q.shape[2] // heads
    if scale is None:
        scale = float(d) ** -0.5
    if d % 8 != 0:
        # Mosaic requires the (sub)lane dims of a block to be 8/128-aligned;
        # degenerate head dims (tiny test configs) take the XLA formulation.
        return _xla_reference(q, k, v, heads, float(scale))
    return _temporal(q, k, v, heads, float(scale), int(block_l))
