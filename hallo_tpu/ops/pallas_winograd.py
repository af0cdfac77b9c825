"""Winograd F(2x2, 3x3) convolution as a Pallas TPU kernel.

STATUS (r2, MEASURED — dead end, kept gated OFF): despite a correct ~1.9x
MXU-pass reduction, the kernel runs 0.32x direct at the L0 production shape
((32,64,64,320)->320: 8.76 ms vs 2.81 ms) and 0.62x at L1 — the 16 shifted
4x4 tile-window reads per strip lower to VPU relayouts that dominate
(27.6 TF/s effective vs 86 TF/s direct). Production would lose further:
XLA fuses GN/silu into the direct conv, which this kernel forfeits. Do not
re-attempt without a formulation whose in-kernel slab reads are contiguous.

Replaces XLA's direct 3x3 conv (implicit GEMM: M x ceil(9C/128) x ceil(Co/128)
MXU passes) with the Winograd transform domain: 16 batched matmuls of
(tiles, C) @ (C, Co) — (M/4) x 16 x ceil(C/128) x ceil(Co/128) passes, a ~1.9x
pass reduction at C=320 (2.25x at C >= 512). The 4x4<->2x2 tile transforms are
VPU adds performed entirely in VMEM.

Reference parity: computes exactly the reference's nn.Conv2d(3x3, pad=1)
inflated conv (hallo/models/resnet.py:50-66); transforms use only {0, ±1,
±0.5} coefficients so the only numeric difference from direct bf16 conv is
benign reassociation.

Layout contract (measured rules, CLAUDE.md + Mosaic lowering limits):
- Channels stay on lanes; ALL in-kernel slicing is contiguous (stride-2
  pixel<->tile interleaves lower to unsupported gathers/relayouts). The
  input arrives split into its four (row, col) parity phases (XLA strided
  slices, fused into the producer); the output leaves W-parity-split
  (B, H, 2, W/2, Co) and one XLA transpose restores NHWC (fuses into the
  consumer).
- Each transform matmul gets exactly 128 tile-rows (the MXU row floor):
  TR = 128 / (W/2) tile-rows per strip.
- Row halo (a strip needs TR+1 phase rows) is MATERIALIZED by XLA into a
  (B, n_strips, TR+1, w2+1, C) per-phase array before the kernel (the
  duplicated-block + clamped-index_map alternative kernel-faulted the TPU
  worker at n_strips >= 8 — measured, do not retry).
- The strip loop is a grid dimension, not an in-kernel loop.
- co tiles must be 128-multiples (lane-dim block rule), U kept <= ~5.5 MB.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015; exact in bf16).
_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
    np.float32,
)

_U_VMEM_BUDGET = int(5.5e6)  # bytes of bf16 U block resident in VMEM


def winograd_weights(kernel: jax.Array) -> jax.Array:
    """(3, 3, C, Co) HWIO conv kernel -> (16, C, Co) transform-domain U."""
    u = jnp.einsum("ai,bj,ijcf->abcf", _G, _G, kernel.astype(jnp.float32))
    return u.reshape((16,) + u.shape[2:])


def _wino_kernel(*refs, tr: int, w2: int):
    """One (image, co-tile, strip): 128 tiles -> 16 matmuls -> 2x2 outputs.

    refs: ph[p][q] halo'd strip blocks (1, TR+1, w2+1, C) for the 4 input
    parities (batch and strip folded into one leading dim), then
    U (16, C, co_t), then TWO outputs (1, 2*TR, w2, co_t) — one per
    output-column parity (4-D blocks only; the 5-D single-output variant
    with the parity mid-dim kernel-faulted the worker under back-to-back
    execution) — then scratch v (16, 128, C) bf16 and m (16, 128, co_t) f32.

    Authoring per the measured Mosaic rules (CLAUDE.md): the 16 transform
    slabs live in explicit SCRATCH buffers, not per-statement stack slots
    (the fully-unrolled form was scoped-vmem-borderline and kernel-faulted
    the worker under back-to-back in-jit execution), and the 16 MXU matmuls
    run in a lax.fori_loop with dynamic leading-axis scratch indexing.
    """
    pa, u_ref = refs[0:4], refs[4]
    out0_ref, out1_ref, v_scr, m_scr = refs[5], refs[6], refs[7], refs[8]

    # (TR + 1, w2 + 1, C) per parity: strip rows + 1 halo row.
    ph = [a[0] for a in pa]  # order: (p, q) = (0,0), (0,1), (1,0), (1,1)
    c = ph[0].shape[-1]

    def dslab(di, dj):
        # tile-local (di, dj) for all TR x w2 tiles, via parity phase
        # (di%2, dj%2) at contiguous offset (di//2, dj//2).
        src = ph[(di % 2) * 2 + (dj % 2)]
        a, b = di // 2, dj // 2
        return src[a : a + tr, b : b + w2, :].reshape(tr * w2, c)

    # V = B^T d B directly: each of the 16 transform positions is a +/-
    # combination of at most 4 d slabs (B^T rows have <= 2 nonzeros).
    # Bt rows as (coeff, d-row) pairs:
    bt = ((1, 0), (-1, 2)), ((1, 1), (1, 2)), ((-1, 1), (1, 2)), ((1, 1), (-1, 3))
    for a in range(4):
        for b in range(4):
            acc = None
            for ca, ia in bt[a]:
                for cb, jb in bt[b]:
                    term = dslab(ia, jb)
                    term = term if ca * cb > 0 else -term
                    acc = term if acc is None else acc + term
            v_scr[a * 4 + b] = acc

    # M[k] = V[k] @ U[k] on the MXU, f32 accumulation.
    def mm(k, _):
        m_scr[k] = jnp.dot(
            v_scr[k], u_ref[k], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, 16, mm, 0, unroll=False)

    # Y = A^T M A -> the 2x2 output pixels of each tile.
    out_dt = out0_ref.dtype
    co = m_scr.shape[-1]

    def m_at(a, b):
        return m_scr[a * 4 + b]

    def half(row_terms):  # column parities of one row parity
        p = [None] * 4
        for b in range(4):
            s = None
            for coeff, a in row_terms:
                t = m_at(a, b) if coeff > 0 else -m_at(a, b)
                s = t if s is None else s + t
            p[b] = s
        y0 = (p[0] + p[1] + p[2]).astype(out_dt).reshape(tr, w2, co)
        y1 = (p[1] - p[2] - p[3]).astype(out_dt).reshape(tr, w2, co)
        return y0, y1

    y00, y01 = half(((1, 0), (1, 1), (1, 2)))
    y10, y11 = half(((1, 1), (-1, 2), (-1, 3)))
    # Row-interleave parities on free dims: (TR, 2, w2, co) -> (2TR, w2, co).
    out0_ref[0] = jnp.stack([y00, y10], axis=1).reshape(2 * tr, w2, co)
    out1_ref[0] = jnp.stack([y01, y11], axis=1).reshape(2 * tr, w2, co)


@functools.lru_cache(maxsize=None)
def _pick_co_tile(c: int, cout: int) -> int:
    """co tile: full cout if U fits, else the largest 128-multiple divisor
    (lane-dim blocks must be 128-multiples or the whole dim)."""
    if 16 * c * cout * 2 <= _U_VMEM_BUDGET:
        return cout
    for cand in (512, 384, 256, 128):
        if cout % cand == 0 and 16 * c * cand * 2 <= _U_VMEM_BUDGET:
            return cand
    return 0


def winograd_eligible(x_shape, kernel_shape, strides, padding) -> bool:
    if tuple(kernel_shape[:2]) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if padding != 1:
        return False
    _, h, w, c = x_shape
    cout = kernel_shape[-1]
    if w < 16 or w % 2 or 128 % (w // 2) != 0:
        return False  # TR = 128/(W/2) must be integral
    tr = 128 // (w // 2)
    if h % (2 * tr) != 0:
        return False
    total = x_shape[0] * (h // 2) // tr  # leading grid extent
    while total > 128:  # must chunk to <= 128 by halving (see call site)
        if total % 2:
            return False
        total //= 2
    return _pick_co_tile(c, cout) > 0


def winograd_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """3x3 stride-1 pad-1 conv, NHWC x HWIO -> NHWC via Winograd F(2,3).

    Numerics: bf16 inputs/weights with f32 accumulation, like the direct
    XLA conv; transform coefficients are exact in bf16.
    """
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    assert winograd_eligible(x.shape, kernel.shape, (1, 1), 1), (
        x.shape,
        kernel.shape,
    )
    w2 = w // 2
    tr = 128 // w2  # tile-rows per strip -> 128 tiles per matmul
    n_strips = (h // 2) // tr
    co_t = _pick_co_tile(c, cout)
    n_co = cout // co_t

    u = winograd_weights(kernel).astype(x.dtype)

    # Split the four pixel parities via reshape + static index — NEVER
    # strided slices: the p::2/q::2 (and tr::tr halo) strided-slice
    # formulation kernel-faulted the TPU worker after ~1.5-4k cumulative
    # grid steps (measured; the Pallas kernel itself was exonerated by
    # running it on prebuilt phases for 200 looped iterations).
    # Each phase gets h/2 + 1 = n_strips*TR + 1 rows and w2 + 1 cols.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xg = xp.reshape(b, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    phases = [xg[:, :, p, :, q, :] for p in (0, 1) for q in (0, 1)]

    # Pad the per-phase column count (w2 + 1) up to a sublane multiple so
    # every DMA'd (cols, C) tile is 8-row aligned (w2 + 1 is odd; partial
    # tiles were the prime suspect in the slow-corruption worker faults).
    wp = ((w2 + 1 + 7) // 8) * 8

    def strip_halo(ph):
        # (B, rows, w2+1, C) -> (B*n_strips, TR+1, wp, C); halo row = the
        # next strip's first row == last row of each offset-by-1 group,
        # gathered by reshape + static index (no strided slice).
        body = ph[:, :-1].reshape(b, n_strips, tr, w2 + 1, c)
        halo = ph[:, 1:].reshape(b, n_strips, tr, w2 + 1, c)[:, :, tr - 1 :]
        out = jnp.concatenate([body, halo], axis=2).reshape(
            b * n_strips, tr + 1, w2 + 1, c
        )
        return jnp.pad(out, ((0, 0), (0, 0), (0, wp - (w2 + 1)), (0, 0)))

    phases = [strip_halo(ph) for ph in phases]

    spec_in = pl.BlockSpec((1, tr + 1, wp, c), lambda gi, ci: (gi, 0, 0, 0))
    spec_out = pl.BlockSpec((1, 2 * tr, w2, co_t), lambda gi, ci: (gi, 0, 0, ci))

    def call(phs):
        g = phs[0].shape[0]
        out_sds = jax.ShapeDtypeStruct((g, 2 * tr, w2, cout), x.dtype)
        return pl.pallas_call(
            functools.partial(_wino_kernel, tr=tr, w2=w2),
            grid=(g, n_co),
            in_specs=[spec_in] * 4
            + [pl.BlockSpec((16, c, co_t), lambda gi, ci: (0, 0, ci))],
            out_specs=[spec_out, spec_out],
            out_shape=[out_sds, out_sds],
            scratch_shapes=[
                pltpu.VMEM((16, tr * w2, c), x.dtype),
                pltpu.VMEM((16, tr * w2, co_t), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(*phs, u)

    # MEASURED fault workaround: a leading grid dim >= ~192 steps inside a
    # jitted loop crashes the TPU worker (128 is solid, incl. 12x
    # back-to-back in-loop executions; single dispatches at 256 are fine).
    # Chunk the (B * n_strips) dim to <= 128 grid steps per pallas_call.
    total = b * n_strips
    chunk = total
    while chunk > 128:
        assert chunk % 2 == 0, (b, n_strips)
        chunk //= 2
    if chunk == total:
        out0, out1 = call(phases)
    else:
        stacked = [p.reshape(total // chunk, chunk, *p.shape[1:]) for p in phases]
        out0, out1 = jax.lax.map(call, tuple(stacked))
        out0 = out0.reshape(total, *out0.shape[2:])
        out1 = out1.reshape(total, *out1.shape[2:])

    # Column parity interleave back into W (pixel col = 2j + parity).
    out = jnp.stack([out0, out1], axis=3).reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3x3_direct(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """XLA direct conv oracle/fallback (same contract)."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


@jax.custom_vjp
def winograd_conv3x3_vjp(x, kernel, bias):
    return winograd_conv3x3(x, kernel, bias)


def _wino_fwd(x, kernel, bias):
    return winograd_conv3x3(x, kernel, bias), (x, kernel)


def _wino_bwd(res, g):
    x, kernel = res
    g = g.astype(x.dtype)
    # dL/dx: correlate g with the spatially-flipped, io-swapped kernel.
    k_flip = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g,
        k_flip.astype(g.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # dL/dk: conv of x with g as the "kernel" over the batch dim.
    dk = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0),
        g.transpose(1, 2, 0, 3),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3).astype(kernel.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32)
    return dx, dk, db


winograd_conv3x3_vjp.defvjp(_wino_fwd, _wino_bwd)


def use_winograd() -> bool:
    """Env-gated dispatch (measured on TPU before defaulting on)."""
    return os.environ.get("HALLO_WINOGRAD", "0") == "1"
