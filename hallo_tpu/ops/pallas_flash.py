"""Fused flash-attention kernel for TPU (Pallas -> Mosaic).

Replaces the reference's xformers CUDA memory-efficient attention
(motion_module.py:58-59, stage configs enable_xformers...) for the three hot
layouts of this model family:

- spatial self-attention with reference-KV concat (Lq up to 4096, Lk = 2*Lq)
- hierarchical audio cross-attention (Lk = 32 tokens)
- temporal attention (tiny Lq = frames, huge batch)

Design (see /opt/skills/guides/boom_attention_tricks.md):
- grid (B, H, Lq/block_q, Lk/block_k); online softmax with fp32 m/l/acc
  scratch persisting across KV tiles
- VPU economy: SD-1.5 head dims (40/80) make attention softmax-bound on the
  VPU, so the softmax runs in the exp2 domain with log2(e) (and the sm scale)
  folded into Q before the kernel — one transcendental and no separate scale
  pass per scores element
- optional additive per-key bias (B, Lk) — the CFG-uncond "mask the ref
  tokens" trick (mutual_self_attention.py:264-284); the no-bias variant
  skips the add entirely; padding masking is folded into the same bias
- mask value -0.7*f32_max (not -inf) to avoid exp(-inf - -inf) NaNs
- backward: custom_vjp recomputing attention with the XLA formulation (exact
  same math; trades memory for a second pass) so the kernel is usable in
  training without a handwritten backward yet.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
# Training block clamp for the packed kernel: the with_lse forward adds the
# (heads, 8, block_q) f32 stats output + double-buffered io blocks on top of
# the inference kernel's footprint, and at the inference-optimal 1024x1024
# blocks the 512^2 spatial shape exceeds the 16 MB scoped-vmem limit by ~2 MB
# (measured: 18.07M on the stage-2 full-width step). The backward tiles
# independently of the forward (the saved lse is a dense (B, heads, 1, Lq)
# array, re-padded to the backward's own block_q), so the backward may use
# SMALLER blocks than the forward where its extra buffers (do, dd, dk/dv
# accumulators) push past the limit.
TRAIN_BLOCK_MAX = 512


def _train_bwd_blocks(c: int, block_q: int, block_k: int) -> tuple:
    """Channel-aware scoped-VMEM clamp for the packed flash BACKWARD.

    The dK/dV pass holds double-buffered (block, C) io blocks for q/do/k/v
    AND dk/dv outputs, two (heads, d, block_k) f32 accumulators, plus the
    per-head (block_k, block_q) f32 score/weight temporaries — all of which
    scale with C. Measured on the stage-2 full-width step (512²×14f):
    C=320 fits at 512x512, but C=640 (up_blocks_2 ref-concat self-attention,
    Lq=1024/Lk=2048) needs 16.28M vs the 16.00M scoped-vmem limit. Shrinking
    the kv block (and the q block too at C>768, e.g. the 1280-ch mid block)
    brings every production shape under ~12M with >=128-row MXU tiles.
    """
    if c <= 512:
        return min(block_q, TRAIN_BLOCK_MAX), min(block_k, TRAIN_BLOCK_MAX)
    if c <= 768:
        return min(block_q, TRAIN_BLOCK_MAX), min(block_k, 256)
    return min(block_q, 256), min(block_k, 256)
LOG2E = math.log2(math.e)


def _attention_kernel(
    *refs, has_bias: bool, num_kv_tiles: int
):
    """Online-softmax attention tile. Logits arrive pre-scaled into the exp2
    domain (Q was multiplied by sm_scale * log2e)."""
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, o_ref, m_scratch, l_scratch, acc_scratch = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch = refs
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]  # (bq, D) — pre-scaled by sm_scale * log2(e)
    k = k_ref[0, 0]  # (bk, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)  # (bq, bk) + (1, bk)

    m_prev = m_scratch[...]  # (bq, LANES)
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # lane-broadcasted
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    v = v_ref[0, 0]  # (bk, D)
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _attention_kernel_t(
    *refs, has_bias: bool, num_kv_tiles: int
):
    """Transposed-domain attention tile: scores and the output accumulator
    live transposed so the PV matmul's tiny head-dim (40/80 for SD-1.5) sits
    on the M (row) axis instead of the N (lane) axis of the MXU.

    N < 128 pads to 128 lanes and costs full passes (measured: a
    (4096,8192)x(8192,40) matmul takes exactly as long as x(8192,128)),
    while M < 128 costs only the actual rows. Computing
    O^T = V^T @ P^T instead of O = P @ V turns the PV stage from
    bq x (bk/128) x 1 row-cycles into d x (bk/128) x (bq/128) — a ~2.7x
    reduction at d=40 — beating the "pad-bound MXU ceiling" of the straight
    layout. S^T = K Q^T costs the same as S (symmetric)."""
    if has_bias:
        q_ref, k_ref, vt_ref, bias_ref, o_ref, m_scratch, l_scratch, acc_scratch = refs
    else:
        q_ref, k_ref, vt_ref, o_ref, m_scratch, l_scratch, acc_scratch = refs
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]  # (bq, D) — pre-scaled by sm_scale * log2(e)
    k = k_ref[0, 0]  # (bk, D)
    # S^T tile: (bk, bq)
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_bias:
        st = st + bias_ref[0].reshape(-1, 1).astype(jnp.float32)  # (bk, 1)

    m_prev = m_scratch[...]  # (1, bq) semantics in (8, bq) scratch
    l_prev = l_scratch[...]
    m_curr = jnp.max(st, axis=0, keepdims=True)  # (1, bq)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(st - m_next[:1])
    l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    vt = vt_ref[0, 0]  # (D, bk)
    acc_scratch[...] = acc_scratch[...] * alpha[:1] + jax.lax.dot(
        vt, p.astype(vt.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = l_scratch[...][:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _attention_kernel_t_q8(
    *refs, has_bias: bool, num_kv_tiles: int
):
    """Transposed-domain tile with int8 QK^T (SageAttention-style).

    The MXU runs s8xs8->s32 at twice the bf16 rate (v5e: 394 TOPS vs 197
    TFLOPS), and the QK stage dominates the transposed kernel's pass count
    (Lk x Lq/128 rows vs d x Lk/128 x Lq/128 for PV at d=40), so int8
    scores cut the kernel time by up to ~40%. Q and K are quantized OUTSIDE
    with PER-ROW absmax scales (K mean-smoothed over keys per (b,h,d) —
    the rank-1 Q.mean(K) term is constant per query row and cancels in
    softmax); sm_scale * log2e rides in the Q scales. PV stays bf16
    (P quantization hurts accuracy much more than scores)."""
    if has_bias:
        (q_ref, k_ref, vt_ref, qs_ref, ks_ref, bias_ref, o_ref,
         m_scratch, l_scratch, acc_scratch) = refs
    else:
        (q_ref, k_ref, vt_ref, qs_ref, ks_ref, o_ref,
         m_scratch, l_scratch, acc_scratch) = refs
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]  # (bq, D) int8
    k = k_ref[0, 0]  # (bk, D) int8
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    # per-row dequant: ks (bk, 1) on sublanes x qs (1, bq) on lanes
    st = st * ks_ref[0, 0] * qs_ref[0, 0]
    if has_bias:
        st = st + bias_ref[0].reshape(-1, 1).astype(jnp.float32)  # (bk, 1)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_curr = jnp.max(st, axis=0, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(st - m_next[:1])
    l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    vt = vt_ref[0, 0]  # (D, bk) bf16
    acc_scratch[...] = acc_scratch[...] * alpha[:1] + jax.lax.dot(
        vt, p.astype(vt.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = l_scratch[...][:1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _attention_kernel_packed(
    *refs,
    has_bias: bool,
    num_kv_tiles: int,
    heads: int,
    head_dim: int,
    with_lse: bool = False,
):
    """ALL-HEADS-RESIDENT tile: q/k/v arrive as natural (block, C = H*D)
    slabs (C-minor — the layout every surrounding matmul wants), the head
    loop runs INSIDE the kernel over static lane slices, and the output is
    assembled as a natural (block_q, C) slab.

    Motivation (measured, r1): emitting head-major / transposed layouts to
    HBM makes XLA propagate L-minor layouts through to_out -> residual ->
    LayerNorm -> FF -> proj_out — ~3 ms per downstream matmul at 262 GB/s
    plus relayout copies (~35-55 ms/step at 512²). Keeping head handling
    in VMEM removes every head-major HBM tensor.

    Per-head math is identical to _attention_kernel_t (transposed scores +
    transposed-PV accumulator — the d<128 pass-count optimum); the final
    (d, bq) -> (bq, d) transpose happens once per q-tile in VMEM."""
    refs = list(refs)
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref = refs[:4]
        del refs[:4]
    else:
        q_ref, k_ref, v_ref = refs[:3]
        del refs[:3]
    o_ref = refs.pop(0)
    lse_ref = refs.pop(0) if with_lse else None
    m_scratch, l_scratch, acc_scratch = refs
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    d = head_dim
    for hh in range(heads):
        q = q_ref[0][:, hh * d:(hh + 1) * d]  # (bq, D) — pre-scaled
        k = k_ref[0][:, hh * d:(hh + 1) * d]  # (bk, D)
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bk, bq)
        if has_bias:
            st = st + bias_ref[0].astype(jnp.float32)  # (bk, 1)

        m_prev = m_scratch[hh]  # (8, bq)
        l_prev = l_scratch[hh]
        m_curr = jnp.max(st, axis=0, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(st - m_next[:1])
        l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
        m_scratch[hh] = m_next
        l_scratch[hh] = l_next

        v = v_ref[0][:, hh * d:(hh + 1) * d]  # (bk, D)
        # acc^T (D, bq) += V^T P^T: contract the bk sublane dim of both.
        acc_scratch[hh] = acc_scratch[hh] * alpha[:1] + jax.lax.dot_general(
            v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        for hh in range(heads):
            l = l_scratch[hh][:1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, :, hh * d:(hh + 1) * d] = jnp.swapaxes(
                acc_scratch[hh] * l_inv, 0, 1
            ).astype(o_ref.dtype)
            if lse_ref is not None:
                # base-2 logsumexp of the (already exp2-domain) logits; rows
                # with every key masked get +huge so the backward's
                # p = exp2(st - lse) recomputes exactly 0 for them.
                lse = m_scratch[hh] + jnp.log2(l_scratch[hh])
                lse_ref[0, hh] = jnp.where(
                    l_scratch[hh] == 0.0, -MASK_VALUE, lse
                )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "block_q", "block_k", "with_lse"),
)
def _flash_forward_packed(
    q: jax.Array,  # (B, Lq, C) natural, C = heads * d
    k: jax.Array,  # (B, Lk, C)
    v: jax.Array,
    bias: Optional[jax.Array],
    heads: int,
    scale: float,
    block_q: int,
    block_k: int,
    with_lse: bool = False,
) -> jax.Array:
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // heads

    qt = q * jnp.asarray(scale * LOG2E, q.dtype)

    block_q = min(block_q, max(LANES, lq))
    block_k = min(block_k, max(LANES, lk))
    qt = _pad_to(qt, 1, block_q)
    kt = _pad_to(k, 1, block_k)
    vt = _pad_to(v, 1, block_k)
    lq_p, lk_p = qt.shape[1], kt.shape[1]

    has_bias = bias is not None or lk_p != lk
    if has_bias:
        full_bias = jnp.zeros((b, lk_p), jnp.float32)
        if lk_p != lk:
            pad_mask = jnp.arange(lk_p) >= lk
            full_bias = jnp.where(pad_mask[None, :], MASK_VALUE, 0.0)
            full_bias = jnp.broadcast_to(full_bias, (b, lk_p))
        if bias is not None:
            user = bias.reshape(b, -1).astype(jnp.float32) * LOG2E
            full_bias = (
                full_bias.at[:, :lk].add(user) if lk_p != lk else full_bias + user
            )
        full_bias = full_bias.reshape(b, lk_p, 1)  # keys on sublanes

    num_q_tiles = lq_p // block_q
    num_kv_tiles = lk_p // block_k
    grid = (b, num_q_tiles, num_kv_tiles)

    in_specs = [
        pl.BlockSpec((1, block_q, c), lambda bi, qi, ki: (bi, qi, 0)),
        pl.BlockSpec((1, block_k, c), lambda bi, qi, ki: (bi, ki, 0)),
        pl.BlockSpec((1, block_k, c), lambda bi, qi, ki: (bi, ki, 0)),
    ]
    inputs = [qt, kt, vt]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, block_k, 1), lambda bi, qi, ki: (bi, ki, 0))
        )
        inputs.append(full_bias)

    out_shape = [jax.ShapeDtypeStruct((b, lq_p, c), v.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, c), lambda bi, qi, ki: (bi, qi, 0))]
    if with_lse:
        # (B, heads, 8, Lq): 8 replicated sublane rows so backward kernels
        # can load (8, block_q) slabs and take [:1] — same trick as the
        # m/l scratch layout (1-D stores/loads are relayout-hostile).
        out_shape.append(
            jax.ShapeDtypeStruct((b, heads, 8, lq_p), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, heads, 8, block_q), lambda bi, qi, ki: (bi, 0, 0, qi)
            )
        )

    res = pl.pallas_call(
        functools.partial(
            _attention_kernel_packed,
            has_bias=has_bias,
            num_kv_tiles=num_kv_tiles,
            heads=heads,
            head_dim=d,
            with_lse=with_lse,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((heads, 8, block_q), jnp.float32),
            pltpu.VMEM((heads, 8, block_q), jnp.float32),
            pltpu.VMEM((heads, d, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    if with_lse:
        return res[0][:, :lq, :], res[1][:, :, :1, :lq]
    return res[0][:, :lq, :]


LN2 = 1.0 / LOG2E


def _dkv_kernel_packed(
    *refs, has_bias: bool, num_q_tiles: int, heads: int, head_dim: int
):
    """Flash-attention backward, dK/dV pass (packed all-heads layout).

    Standard two-pass flash backward (Dao 2022 recurrence, re-derived for
    the exp2 domain of the forward): P is recomputed exactly from the saved
    base-2 logsumexp, so no scores tensor ever reaches HBM — the XLA-vjp
    fallback materializes (B, H, Lq, Lk) f32 scores, which at the stage-2
    training shape (14x8x4096x4096x4B = 7.5 GB per spatial attention) cannot
    fit; this kernel is what makes full-width 512^2 training possible.

    grid (b, kv_tile, q_tile) — accumulates dk/dv over q tiles in scratch.
    Inputs q arrives pre-scaled by sm_scale*log2(e) (as in forward), k/v
    raw; dk picks up the 1/log2(e) factor at store, dv needs none.
    """
    refs = list(refs)
    if has_bias:
        q_ref, do_ref, k_ref, v_ref, lse_ref, dd_ref, bias_ref = refs[:7]
        del refs[:7]
    else:
        q_ref, do_ref, k_ref, v_ref, lse_ref, dd_ref = refs[:6]
        del refs[:6]
    dk_ref, dv_ref, dk_acc, dv_acc = refs
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    d = head_dim
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        q = q_ref[0][:, sl]  # (bq, d), pre-scaled
        do = do_ref[0][:, sl]  # (bq, d)
        k = k_ref[0][:, sl]  # (bk, d)
        v = v_ref[0][:, sl]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bk, bq) — exp2-domain logits, transposed like the forward
        if has_bias:
            st = st + bias_ref[0].astype(jnp.float32)
        p = jnp.exp2(st - lse_ref[0, hh][:1])  # == softmax weights exactly
        # dVᵀ (d, bk) += dOᵀ Pᵀ
        dv_acc[hh] += jax.lax.dot_general(
            do, p.astype(do.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP (bk, bq) = V dOᵀ ; dS = P ∘ (dP - D)
        dp = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dd_ref[0, hh][:1])
        # dKᵀ (d, bk) += Q_scaledᵀ dSᵀ  (scale*log2e folded in q)
        dk_acc[hh] += jax.lax.dot_general(
            q, ds.astype(q.dtype), (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_idx == num_q_tiles - 1)
    def _store():
        for hh in range(heads):
            sl = slice(hh * d, (hh + 1) * d)
            dk_ref[0, :, sl] = jnp.swapaxes(dk_acc[hh] * LN2, 0, 1).astype(
                dk_ref.dtype
            )
            dv_ref[0, :, sl] = jnp.swapaxes(dv_acc[hh], 0, 1).astype(
                dv_ref.dtype
            )


def _dq_kernel_packed(
    *refs, has_bias: bool, num_kv_tiles: int, heads: int, head_dim: int,
    scale: float,
):
    """Flash-attention backward, dQ pass. grid (b, q_tile, kv_tile) —
    accumulates dq over kv tiles; see _dkv_kernel_packed."""
    refs = list(refs)
    if has_bias:
        q_ref, do_ref, k_ref, v_ref, lse_ref, dd_ref, bias_ref = refs[:7]
        del refs[:7]
    else:
        q_ref, do_ref, k_ref, v_ref, lse_ref, dd_ref = refs[:6]
        del refs[:6]
    dq_ref, dq_acc = refs
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    d = head_dim
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        q = q_ref[0][:, sl]
        do = do_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            st = st + bias_ref[0].astype(jnp.float32)
        p = jnp.exp2(st - lse_ref[0, hh][:1])
        dp = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - dd_ref[0, hh][:1])  # (bk, bq), natural domain
        # dQᵀ (d, bq) += K_rawᵀ dS
        dq_acc[hh] += jax.lax.dot_general(
            k, ds.astype(k.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        for hh in range(heads):
            sl = slice(hh * d, (hh + 1) * d)
            dq_ref[0, :, sl] = jnp.swapaxes(dq_acc[hh] * scale, 0, 1).astype(
                dq_ref.dtype
            )


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "block_q", "block_k")
)
def _flash_backward_packed(
    q: jax.Array,  # (B, Lq, C)
    k: jax.Array,  # (B, Lk, C)
    v: jax.Array,
    bias: Optional[jax.Array],  # (B, Lk) natural-domain additive or None
    out: jax.Array,  # (B, Lq, C) forward output
    lse: jax.Array,  # (B, heads, 1, Lq) base-2 logsumexp from forward
    g: jax.Array,  # (B, Lq, C) output cotangent
    heads: int,
    scale: float,
    block_q: int,
    block_k: int,
):
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // heads

    qt = q * jnp.asarray(scale * LOG2E, q.dtype)
    block_q = min(block_q, max(LANES, lq))
    block_k = min(block_k, max(LANES, lk))
    qt = _pad_to(qt, 1, block_q)
    do = _pad_to(g.astype(q.dtype), 1, block_q)
    kt = _pad_to(k, 1, block_k)
    vt = _pad_to(v, 1, block_k)
    lq_p, lk_p = qt.shape[1], kt.shape[1]

    # D_i = rowsum(dO ∘ O) per head, padded-q rows +huge-lse ⇒ p = 0 there
    dd = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, lq, heads, d
    ).sum(-1).transpose(0, 2, 1)  # (B, heads, Lq)
    dd = _pad_to(dd[:, :, None, :], 3, block_q)  # (B, heads, 1, Lq_p)
    lse_p = _pad_to(lse, 3, block_q, value=-MASK_VALUE)
    dd = jnp.broadcast_to(dd, (b, heads, 8, lq_p))
    lse_p = jnp.broadcast_to(lse_p, (b, heads, 8, lq_p))

    has_bias = bias is not None or lk_p != lk
    if has_bias:
        full_bias = jnp.zeros((b, lk_p), jnp.float32)
        if lk_p != lk:
            pad_mask = jnp.arange(lk_p) >= lk
            full_bias = jnp.where(pad_mask[None, :], MASK_VALUE, 0.0)
            full_bias = jnp.broadcast_to(full_bias, (b, lk_p))
        if bias is not None:
            user = bias.reshape(b, -1).astype(jnp.float32) * LOG2E
            full_bias = (
                full_bias.at[:, :lk].add(user) if lk_p != lk else full_bias + user
            )
        full_bias = full_bias.reshape(b, lk_p, 1)

    num_q_tiles = lq_p // block_q
    num_kv_tiles = lk_p // block_k

    qspec = lambda bi, i, j: (bi, j, 0)  # noqa: E731 (q/do vary on LAST dim)
    kspec = lambda bi, i, j: (bi, i, 0)  # noqa: E731
    common_dkv = [
        pl.BlockSpec((1, block_q, c), qspec),  # q
        pl.BlockSpec((1, block_q, c), qspec),  # do
        pl.BlockSpec((1, block_k, c), kspec),  # k
        pl.BlockSpec((1, block_k, c), kspec),  # v
        pl.BlockSpec((1, heads, 8, block_q), lambda bi, i, j: (bi, 0, 0, j)),
        pl.BlockSpec((1, heads, 8, block_q), lambda bi, i, j: (bi, 0, 0, j)),
    ]
    inputs = [qt, do, kt, vt, lse_p, dd]
    if has_bias:
        common_dkv.append(
            pl.BlockSpec((1, block_k, 1), lambda bi, i, j: (bi, i, 0))
        )
        inputs.append(full_bias)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel_packed,
            has_bias=has_bias,
            num_q_tiles=num_q_tiles,
            heads=heads,
            head_dim=d,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, lk_p, c), k.dtype),
            jax.ShapeDtypeStruct((b, lk_p, c), v.dtype),
        ],
        grid=(b, num_kv_tiles, num_q_tiles),
        in_specs=common_dkv,
        out_specs=[
            pl.BlockSpec((1, block_k, c), kspec),
            pl.BlockSpec((1, block_k, c), kspec),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, d, block_k), jnp.float32),
            pltpu.VMEM((heads, d, block_k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    qspec2 = lambda bi, i, j: (bi, i, 0)  # noqa: E731 (q varies on dim 1)
    kspec2 = lambda bi, i, j: (bi, j, 0)  # noqa: E731
    dq_specs = [
        pl.BlockSpec((1, block_q, c), qspec2),
        pl.BlockSpec((1, block_q, c), qspec2),
        pl.BlockSpec((1, block_k, c), kspec2),
        pl.BlockSpec((1, block_k, c), kspec2),
        pl.BlockSpec((1, heads, 8, block_q), lambda bi, i, j: (bi, 0, 0, i)),
        pl.BlockSpec((1, heads, 8, block_q), lambda bi, i, j: (bi, 0, 0, i)),
    ]
    if has_bias:
        dq_specs.append(
            pl.BlockSpec((1, block_k, 1), lambda bi, i, j: (bi, j, 0))
        )

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel_packed,
            has_bias=has_bias,
            num_kv_tiles=num_kv_tiles,
            heads=heads,
            head_dim=d,
            scale=scale,
        ),
        out_shape=jax.ShapeDtypeStruct((b, lq_p, c), q.dtype),
        grid=(b, num_q_tiles, num_kv_tiles),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, c), qspec2),
        scratch_shapes=[pltpu.VMEM((heads, d, block_q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    return dq[:, :lq], dk[:, :lk], dv[:, :lk]


def _xla_reference_packed(q, k, v, bias, heads, scale):
    b, lq, c = q.shape
    d = c // heads
    qh = q.reshape(b, lq, heads, d)
    kh = k.reshape(b, -1, heads, d)
    vh = v.reshape(b, -1, heads, d)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.reshape(b, 1, 1, -1).astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), vh)
    return o.reshape(b, lq, c).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_packed(q, k, v, bias, heads, scale, block_q, block_k):
    return _flash_forward_packed(q, k, v, bias, heads, scale, block_q, block_k)


def _flash_packed_fwd(q, k, v, bias, heads, scale, block_q, block_k):
    # Training forward: clamp to TRAIN_BLOCK_MAX (VMEM rationale at the
    # constant) — the backward dominates training attention time anyway.
    out, lse = _flash_forward_packed(
        q, k, v, bias, heads, scale,
        min(block_q, TRAIN_BLOCK_MAX), min(block_k, TRAIN_BLOCK_MAX),
        with_lse=True,
    )
    return out, (q, k, v, bias, out, lse)


def _flash_packed_bwd(heads, scale, block_q, block_k, residuals, g):
    """Pallas flash backward by default (no scores tensor in HBM — required
    at training scale where the XLA recompute's (B,H,Lq,Lk) f32 scores run
    to gigabytes). HALLO_FLASH_BWD=xla selects the XLA-vjp recompute
    (exact dbias, useful for small shapes / debugging).

    NOTE: the Pallas path returns a ZERO cotangent for `bias` — every bias
    in this codebase is a constant mask (CFG-uncond ref blocking /
    key-padding), never a trained parameter. Use the env fallback if a
    differentiable bias is ever introduced."""
    q, k, v, bias, out, lse = residuals
    if os.environ.get("HALLO_FLASH_BWD", "pallas") == "xla":
        _, vjp = jax.vjp(
            lambda q, k, v, bb: _xla_reference_packed(q, k, v, bb, heads, scale),
            q, k, v, bias,
        )
        dq, dk, dv, dbias = vjp(g)
        return dq, dk, dv, (None if bias is None else dbias)
    bwd_q, bwd_k = _train_bwd_blocks(q.shape[-1], block_q, block_k)
    dq, dk, dv = _flash_backward_packed(
        q, k, v, bias, out, lse, g, heads, scale, bwd_q, bwd_k,
    )
    return dq, dk, dv, (None if bias is None else jnp.zeros_like(bias))


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    heads: int,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jax.Array:
    """Fused attention on NATURAL (B, L, C) tensors, C = heads * head_dim.
    No head-major tensor ever reaches HBM; see _attention_kernel_packed."""
    c = q.shape[-1]
    d = c // heads
    if scale is None:
        scale = float(d) ** -0.5
    if block_q is None:
        block_q = 1024 if c <= 384 else 512
    if block_k is None:
        block_k = 1024 if c <= 384 else 512
    if bias is not None:
        bias = jnp.broadcast_to(
            bias.reshape(bias.shape[0], -1)[:, -k.shape[1]:],
            (q.shape[0], k.shape[1]),
        )
    return _flash_packed(
        q, k, v, bias, int(heads), float(scale), int(block_q), int(block_k)
    )


def _pad_to(x: jax.Array, axis: int, multiple: int, value=0.0) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_forward_t(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    scale: float,
    block_q: int,
    block_k: int,
) -> jax.Array:
    """Transposed-PV forward (see _attention_kernel_t). Used when the head
    dim is not a lane multiple (SD-1.5: 40/80/160), where the straight
    layout's PV matmul pays full 128-lane passes for d useful columns."""
    b, h, lq, d = q.shape
    lk = k.shape[2]

    qt = q * jnp.asarray(scale * LOG2E, q.dtype)
    kt = k
    vt = jnp.swapaxes(v, 2, 3)  # (B, H, D, Lk) — one XLA transpose, HBM-bound

    block_q = min(block_q, max(LANES, lq))
    block_k = min(block_k, max(LANES, lk))
    qt = _pad_to(qt, 2, block_q)
    kt = _pad_to(kt, 2, block_k)
    vt = _pad_to(vt, 3, block_k)
    lq_p, lk_p = qt.shape[2], kt.shape[2]

    has_bias = bias is not None or lk_p != lk
    if has_bias:
        full_bias = jnp.zeros((b, lk_p), jnp.float32)
        if lk_p != lk:
            pad_mask = jnp.arange(lk_p) >= lk
            full_bias = jnp.where(pad_mask[None, :], MASK_VALUE, 0.0)
            full_bias = jnp.broadcast_to(full_bias, (b, lk_p))
        if bias is not None:
            user = bias.reshape(b, -1).astype(jnp.float32) * LOG2E
            full_bias = (
                full_bias.at[:, :lk].add(user) if lk_p != lk else full_bias + user
            )
        # keys on the SUBLANE axis for the transposed kernel: (B, Lk_p, 1)
        full_bias = full_bias.reshape(b, lk_p, 1)

    num_q_tiles = lq_p // block_q
    num_kv_tiles = lk_p // block_k
    grid = (b, h, num_q_tiles, num_kv_tiles)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
        pl.BlockSpec((1, 1, d, block_k), lambda bi, hi, qi, ki: (bi, hi, 0, ki)),
    ]
    inputs = [qt, kt, vt]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, block_k, 1), lambda bi, hi, qi, ki: (bi, ki, 0))
        )
        inputs.append(full_bias)

    out = pl.pallas_call(
        functools.partial(
            _attention_kernel_t, has_bias=has_bias, num_kv_tiles=num_kv_tiles
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d, lq_p), v.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, d, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)
        ),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    return jnp.swapaxes(out, 2, 3)[:, :, :lq, :]


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_forward_t_q8(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    scale: float,
    block_q: int,
    block_k: int,
) -> jax.Array:
    """Transposed-PV forward with int8 QK (see _attention_kernel_t_q8).
    Opt-in (HALLO_INT8_ATTN=1): scores carry ~0.5% relative error — output
    parity is LPIPS-level, not bitwise."""
    b, h, lq, d = q.shape
    lk = k.shape[2]

    # Mean-smooth K over the key axis (rank-1 scores shift, constant per
    # query row -> cancels in softmax) and absmax-quantize with PER-ROW
    # scales (per token, not per head — ~3x lower relative error).
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    kf = kf - jnp.mean(kf, axis=2, keepdims=True)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=3, keepdims=True) / 127.0, 1e-8)
    ks = jnp.maximum(jnp.max(jnp.abs(kf), axis=3, keepdims=True) / 127.0, 1e-8)
    q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    k8 = jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8)
    # sm_scale and the exp2 change of base ride in the Q scales:
    # qs_t (B, H, 1, Lq) lives on lanes; ks (B, H, Lk, 1) on sublanes.
    qs_t = jnp.swapaxes(qs * (scale * LOG2E), 2, 3)
    vt = jnp.swapaxes(v, 2, 3)  # (B, H, D, Lk)

    block_q = min(block_q, max(LANES, lq))
    block_k = min(block_k, max(LANES, lk))
    q8 = _pad_to(q8, 2, block_q)
    k8 = _pad_to(k8, 2, block_k)
    vt = _pad_to(vt, 3, block_k)
    qs_t = _pad_to(qs_t, 3, block_q, value=1.0)
    ks = _pad_to(ks, 2, block_k, value=1.0)
    lq_p, lk_p = q8.shape[2], k8.shape[2]

    has_bias = bias is not None or lk_p != lk
    if has_bias:
        full_bias = jnp.zeros((b, lk_p), jnp.float32)
        if lk_p != lk:
            pad_mask = jnp.arange(lk_p) >= lk
            full_bias = jnp.where(pad_mask[None, :], MASK_VALUE, 0.0)
            full_bias = jnp.broadcast_to(full_bias, (b, lk_p))
        if bias is not None:
            user = bias.reshape(b, -1).astype(jnp.float32) * LOG2E
            full_bias = (
                full_bias.at[:, :lk].add(user) if lk_p != lk else full_bias + user
            )
        full_bias = full_bias.reshape(b, lk_p, 1)

    num_q_tiles = lq_p // block_q
    num_kv_tiles = lk_p // block_k
    grid = (b, h, num_q_tiles, num_kv_tiles)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
        pl.BlockSpec((1, 1, d, block_k), lambda bi, hi, qi, ki: (bi, hi, 0, ki)),
        pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
        pl.BlockSpec((1, 1, block_k, 1), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
    ]
    inputs = [q8, k8, vt, qs_t, ks]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, block_k, 1), lambda bi, hi, qi, ki: (bi, ki, 0))
        )
        inputs.append(full_bias)

    out = pl.pallas_call(
        functools.partial(
            _attention_kernel_t_q8, has_bias=has_bias, num_kv_tiles=num_kv_tiles
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d, lq_p), v.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, d, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi)
        ),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    return jnp.swapaxes(out, 2, 3)[:, :, :lq, :]


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    scale: float,
    block_q: int,
    block_k: int,
) -> jax.Array:
    b, h, lq, d = q.shape
    lk = k.shape[2]

    # Fold sm-scale and the exp->exp2 change of base into Q (one cheap
    # multiply instead of a per-scores-element pass).
    qt = q * jnp.asarray(scale * LOG2E, q.dtype)
    kt, vt = k, v

    block_q = min(block_q, max(LANES, lq))
    block_k = min(block_k, max(LANES, lk))
    qt = _pad_to(qt, 2, block_q)
    kt = _pad_to(kt, 2, block_k)
    vt = _pad_to(vt, 2, block_k)
    lq_p, lk_p = qt.shape[2], kt.shape[2]

    # Fold user bias + KV padding mask into one (B, Lk_p) f32 bias (exp2
    # domain). No padding and no user bias -> biasless fast path.
    has_bias = bias is not None or lk_p != lk
    if has_bias:
        full_bias = jnp.zeros((b, lk_p), jnp.float32)
        if lk_p != lk:
            pad_mask = jnp.arange(lk_p) >= lk
            full_bias = jnp.where(pad_mask[None, :], MASK_VALUE, 0.0)
            full_bias = jnp.broadcast_to(full_bias, (b, lk_p))
        if bias is not None:
            user = bias.reshape(b, -1).astype(jnp.float32) * LOG2E
            full_bias = (
                full_bias.at[:, :lk].add(user) if lk_p != lk else full_bias + user
            )
        full_bias = full_bias[:, None, :]  # (B, 1, Lk_p)

    num_q_tiles = lq_p // block_q
    num_kv_tiles = lk_p // block_k
    grid = (b, h, num_q_tiles, num_kv_tiles)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
    ]
    inputs = [qt, kt, vt]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki))
        )
        inputs.append(full_bias)

    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, has_bias=has_bias, num_kv_tiles=num_kv_tiles
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d), v.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*inputs)

    return out[:, :, :lq, :]


def _xla_reference(q, k, v, bias, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.reshape(bias.shape[0], 1, 1, -1).astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
    return out.astype(v.dtype)


def _pick_forward(transposed: bool, quant: Optional[str]):
    if transposed and quant == "int8":
        return _flash_forward_t_q8
    return _flash_forward_t if transposed else _flash_forward


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, bias, scale, block_q, block_k, transposed, quant):
    return _pick_forward(transposed, quant)(q, k, v, bias, scale, block_q, block_k)


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, transposed, quant):
    out = _pick_forward(transposed, quant)(q, k, v, bias, scale, block_q, block_k)
    return out, (q, k, v, bias)


def _flash_bwd(scale, block_q, block_k, transposed, quant, residuals, g):
    # Recompute-based backward through the XLA formulation (identical math).
    q, k, v, bias = residuals
    _, vjp = jax.vjp(lambda q, k, v, b: _xla_reference(q, k, v, b, scale), q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, (None if bias is None else dbias)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    quant: Optional[str] = None,
) -> jax.Array:
    """Fused attention, heads-major. q: (B, H, Lq, D); k/v: (B, H, Lk, D);
    bias broadcastable to (B, Lk) (per-key additive logits bias).
    quant="int8": int8 QK^T scores (2x MXU rate, ~0.5% score error; only
    takes effect on the transposed domain with a long KV side).

    Default block sizes are measured-on-v5e optima (scripts/microbench_attn2):
    512x512 ran at 18 TF/s useful on the level-0 spatial shape, 1024x2048 at
    33 TF/s (the scores tile bq*bk*4B is the VMEM budget: 8 MB; 2048x2048
    fails to fit). block_k drops to 1024 for d > 64 to leave room for the
    wider K/V tiles and fp32 accumulator."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    d = q.shape[-1]
    if block_q is None:
        block_q = 1024 if d <= 256 else 512
    if block_k is None:
        # d > 256 (e.g. the VAE encoder/decoder mid attention, one head of
        # d=512) needs smaller tiles: at 1024x1024 the fp32 scores + acc +
        # wide K/V tiles exceed the 16 MB VMEM scoped limit.
        block_k = 2048 if d <= 64 else (1024 if d <= 256 else 512)
    # Transposed-PV domain pays off whenever d is not a lane multiple
    # (128): the PV stage then costs d instead of round_up(d,128) rows.
    transposed = d % LANES != 0
    # int8 scores only where the QK stage is the cost driver (long KV);
    # short-KV cross-attention (audio 32 / identity 4 tokens) keeps bf16.
    if quant == "int8" and (not transposed or k.shape[2] < 1024):
        quant = None
    if bias is not None:
        bias = jnp.broadcast_to(
            bias.reshape(bias.shape[0], -1)[:, -k.shape[2]:], (q.shape[0], k.shape[2])
        )
    return _flash(
        q, k, v, bias, float(scale), int(block_q), int(block_k), bool(transposed),
        quant,
    )
