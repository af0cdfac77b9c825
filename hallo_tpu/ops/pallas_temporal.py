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


def _temporal_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, qh_s, kh_s, vh_s, s_scratch, acc_s,
    *, frames: int, heads: int, head_dim: int
):
    """Natural-layout (1, F, block_l, C) tile, heads looped INSIDE over lane
    slices. Motivation (measured r1): the site-major (B, F, C, L) kernel
    I/O made XLA propagate L-minor layouts through the motion module's
    proj_out -> residual -> the NEXT spatial/audio blocks' Dense ops
    (~3 ms each at 48 GF/s, ~30 ms/step at 512² level 0). Math runs in the
    natural orientation: the D-reduction is a lane-axis sum, scores stack
    (F, block_l) with sites on lanes, PV is a broadcast FMA.

    All per-head working values live in EXPLICIT scratch (qh/kh/vh/s/acc)
    so Mosaic reuses their stack slots across the unrolled loops, and the
    site tile is small (64): the scoped-vmem limit is 16 MB and the
    double-buffered (F, block_l, C) io tiles dominate it (measured:
    block_l=128 allocated 16.95 MB).

    NOTE(r1): a broadcast (F, bl, D) -> (F, bl) score reduction (one
    statement per query frame) hits a Mosaic relayout bug ("Non-singleton
    logical dimension is replicated in destination"); keep per-key-frame
    statements."""
    d = head_dim
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        for g in range(frames):
            qh_s[g] = q_ref[0, g][:, sl]  # (bl, D) — input dtype; the
            kh_s[g] = k_ref[0, g][:, sl]  # f32 upcast happens per use
            vh_s[g] = v_ref[0, g][:, sl]
        def body_f(f, _):
            # dynamic leading-index loads/stores keep the per-query-frame
            # work in ONE traced body — fully unrolling f x g gave every
            # statement its own stack slot (18.5 MB scoped vmem).
            qf = qh_s[f].astype(jnp.float32)
            for g in range(frames):
                s_scratch[g] = jnp.sum(
                    qf * kh_s[g].astype(jnp.float32), axis=1
                )
            s = s_scratch[...]  # (F, bl) fp32, pre-scaled exp2 domain
            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp2(s - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)

            acc_s[...] = jnp.zeros_like(acc_s)
            for g in range(frames):
                acc_s[...] = acc_s[...] + p[g][:, None] * vh_s[g].astype(
                    jnp.float32
                )
            o_ref[0, f, :, sl] = acc_s[...].astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, frames, body_f, 0)


def _temporal_forward_packed(
    q: jax.Array,  # (B, F, L, C) natural, C = heads * D
    k: jax.Array,
    v: jax.Array,
    heads: int,
    scale: float,
    block_l: int,
) -> jax.Array:
    b, f, l, c = q.shape
    d = c // heads

    qt = (q * jnp.asarray(scale * LOG2E, q.dtype)).astype(q.dtype)

    # Tight scoped-vmem budget: the (F, block_l, C) io tiles double-buffer
    # and Mosaic's stack adds ~2-3 MB of temporaries; 64 sites/block keeps
    # an 18-frame 320-channel instance near 6 MB (measured: 128 blocks hit
    # the 16 MB scoped limit at 16.95 MB).
    budget_sites = (3 * 1024 * 1024) // max(f * c * 10, 1)
    block_l = min(block_l, max(64, (budget_sites // 64) * 64))
    block_l = min(block_l, max(64, l))
    pad = (-l) % block_l
    if pad:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0))
        qt = jnp.pad(qt, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
    l_p = qt.shape[2]

    grid = (b, l_p // block_l)
    spec = pl.BlockSpec((1, f, block_l, c), lambda bi, li: (bi, 0, li, 0))
    out = pl.pallas_call(
        functools.partial(
            _temporal_kernel_packed, frames=f, heads=heads, head_dim=d
        ),
        out_shape=jax.ShapeDtypeStruct((b, f, l_p, c), v.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((f, block_l, d), q.dtype),   # q head slice
            pltpu.VMEM((f, block_l, d), q.dtype),   # k head slice
            pltpu.VMEM((f, block_l, d), q.dtype),   # v head slice
            pltpu.VMEM((f, block_l), jnp.float32),  # scores
            pltpu.VMEM((block_l, d), jnp.float32),  # PV accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qt, k, v)
    return out[:, :, :l, :]


def _xla_reference_natural(q, k, v, heads, scale):
    b, f, l, c = q.shape
    d = c // heads
    qh = q.reshape(b, f, l, heads, d)
    kh = k.reshape(b, f, l, heads, d)
    vh = v.reshape(b, f, l, heads, d)
    s = jnp.einsum("bflhd,bglhd->bhlfg", qh, kh, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhlfg,bglhd->bflhd", p, vh)
    return o.reshape(b, f, l, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _temporal_packed(q, k, v, heads, scale, block_l):
    return _temporal_forward_packed(q, k, v, heads, scale, block_l)


def _temporal_packed_fwd(q, k, v, heads, scale, block_l):
    return _temporal_forward_packed(q, k, v, heads, scale, block_l), (q, k, v)


def _temporal_packed_bwd(heads, scale, block_l, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference_natural(q, k, v, heads, scale), q, k, v
    )
    return vjp(g)


_temporal_packed.defvjp(_temporal_packed_fwd, _temporal_packed_bwd)


def temporal_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    heads: int,
    scale: Optional[float] = None,
    block_l: int = 512,
) -> jax.Array:
    """Frame-axis attention at every site on NATURAL (B, F, L, C) tensors.
    Use for the wide-L/narrow-C levels (level 0: L=4096, C<=320) where the
    site-major variant's HBM layout poisons downstream matmuls; deeper
    levels keep `temporal_attention` (their (F, block, C) tiles would
    exceed VMEM)."""
    d = q.shape[-1] // heads
    if scale is None:
        scale = float(d) ** -0.5
    if d % 8 != 0:
        return _xla_reference_natural(q, k, v, heads, float(scale))
    return _temporal_packed(q, k, v, heads, float(scale), int(block_l))


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


def _xla_reference_sliced(q, k, v, heads, scale):
    """Same math as `_xla_reference`, formulated per head with static
    C-slices so every operand keeps L on lanes and D on sublanes.

    The (b, f, heads, d, l) reshape + bhlfg einsum makes XLA lay the
    contraction dim d out on lanes: at d=40 that pads 40 -> 128 (3.2x) and
    the stage-2 512² backward materializes the padded q/k/v copies — 128 MB
    each, measured as top HBM temps of the r4 config-5 OOM. Head slices of
    the C axis are sublane slices (8-aligned for d % 8 == 0), so this
    formulation needs no relayout at all. Used as the recompute-backward
    body of the Pallas kernel (gradients are exact — it is the same
    attention)."""
    b, f, c, l = q.shape
    d = c // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh, vh = q[:, :, sl, :], k[:, :, sl, :], v[:, :, sl, :]
        s = jnp.einsum(
            "bfdl,bgdl->blfg", qh, kh, preferred_element_type=jnp.float32
        )
        p = jax.nn.softmax(s * scale, axis=-1).astype(v.dtype)
        outs.append(jnp.einsum("blfg,bgdl->bfdl", p, vh))
    return jnp.concatenate(outs, axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _temporal(q, k, v, heads, scale, block_l):
    return _temporal_forward(q, k, v, heads, scale, block_l)


def _temporal_fwd(q, k, v, heads, scale, block_l):
    return _temporal_forward(q, k, v, heads, scale, block_l), (q, k, v)


def _temporal_bwd(heads, scale, block_l, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference_sliced(q, k, v, heads, scale), q, k, v
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
