"""Block-wise 8-bit AdamW state (bitsandbytes AdamW8bit equivalent, in optax).

The reference's stage 2 trains with `bnb.optim.AdamW8bit`
(/root/reference/scripts/train_stage2.py:613-622, stage2.yaml:37
`use_8bit_adam: True`): both Adam moments live as int8 with per-block
absmax scales, dequantized/requantized around each update. On a 16 GB v5e
this is what makes the full-width stage-2 moments fit (measured r3: fp32
moments + fp32 params OOM at 24.0 G / 15.75 G HBM).

Design (TPU-friendly, pure jnp — everything stays under jit):
- per-leaf state: q (int8, param-shaped) + scales (f32, one per BLOCK of
  the flattened tensor; bitsandbytes uses block 256, we default the same).
- mu (signed): linear absmax quantization — scale = absmax(block)/127,
  q = round(x/scale). Numerator error is benign.
- nu (non-negative, spans many decades WITHIN a block): linear absmax
  flushes small entries to 0 and their updates explode through
  1/(sqrt(nu)+eps) — the exact failure bitsandbytes' dynamic map exists
  for. We quantize nu in LOG space instead: 8 bits across a fixed
  8.8-decade span below each block's max → <=4% relative error on every
  surviving entry (pinned by the trajectory test).
- leaves smaller than one block stay fp32 (bitsandbytes keeps small
  tensors in 32-bit too — min_8bit_size).
- update math runs in f32 after dequant: exactly optax.scale_by_adam with
  bias correction, then weight decay + lr outside (AdamW split).

Quantization error is injected into the MOMENT history only (the update
direction is computed from freshly-dequantized moments), which is the same
trade bitsandbytes makes; tests pin the trajectory against fp32 adamw.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

BLOCK = 256


class _LeafOut(NamedTuple):
    upd: jax.Array
    mu: "object"
    nu: "object"


class _Q(NamedTuple):
    q: jax.Array       # int8, original shape (or f32 passthrough)
    scales: jax.Array  # f32 (n_blocks,) (or () passthrough)


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array
    mu: chex.ArrayTree   # tree of _Q
    nu: chex.ArrayTree   # tree of _Q


def _quantize(x: jax.Array, block: int) -> _Q:
    if x.size < block or not jnp.issubdtype(x.dtype, jnp.floating):
        return _Q(x.astype(jnp.float32), jnp.zeros((), jnp.float32))
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % block
    padded = jnp.pad(flat, (0, pad)).reshape(-1, block)
    absmax = jnp.max(jnp.abs(padded), axis=1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(padded / scales[:, None]), -127, 127).astype(jnp.int8)
    return _Q(q.reshape(-1)[: flat.size].reshape(x.shape), scales)


# nu log-space span: 255 steps over ~20.3 nats ≈ 8.8 decades below the
# block max; one step = 0.08 nats ≈ 4% relative error. Entries smaller
# than max/10^8.8 dequantize to the span floor (vanishing vs sqrt()+eps).
_LOG_SPAN = 20.3
_TINY = 1e-38


def _quantize_log(x: jax.Array, block: int) -> _Q:
    """int8 log-space quantization for non-negative tensors (nu)."""
    if x.size < block or not jnp.issubdtype(x.dtype, jnp.floating):
        return _Q(x.astype(jnp.float32), jnp.zeros((), jnp.float32))
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % block
    padded = jnp.pad(flat, (0, pad)).reshape(-1, block)
    logx = jnp.log(jnp.maximum(padded, _TINY))
    hi = jnp.max(logx, axis=1)  # per-block log max ("scales")
    rel = (logx - (hi[:, None] - _LOG_SPAN)) / _LOG_SPAN  # 0..1 inside span
    q = jnp.clip(jnp.round(rel * 255.0) - 128.0, -128, 127).astype(jnp.int8)
    return _Q(q.reshape(-1)[: flat.size].reshape(x.shape), hi)


def _dequantize_log(qs: _Q, shape, block: int) -> jax.Array:
    q, hi = qs
    if q.dtype != jnp.int8:
        return q
    flat = q.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % block
    padded = jnp.pad(flat, (0, pad)).reshape(-1, block)
    logx = (padded + 128.0) / 255.0 * _LOG_SPAN + (hi[:, None] - _LOG_SPAN)
    x = jnp.exp(logx)
    # Entries at the span floor (q == -128) dequantize to exp(hi - _LOG_SPAN)
    # ≈ 1.5e-9 × block max — which can exceed eps=1e-8 through rsqrt and damp
    # that coordinate's next update. A floor entry is either a true zero or a
    # value <= 1/10^8.8 of its block max (indistinguishable at 8 bits), so
    # clamp it to exactly 0 per entry; all-zero blocks (hi == log(_TINY))
    # fall out of the same rule.
    x = jnp.where(padded <= -127.5, 0.0, x)
    return x.reshape(-1)[: flat.size].reshape(shape)


def _dequantize(qs: _Q, shape, block: int) -> jax.Array:
    q, scales = qs
    if q.dtype != jnp.int8:
        return q  # fp32 passthrough leaf
    flat = q.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % block
    padded = jnp.pad(flat, (0, pad)).reshape(-1, block)
    x = padded * scales[:, None]
    return x.reshape(-1)[: flat.size].reshape(shape)


def scale_by_adam_8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block: int = BLOCK,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with int8 block-quantized moment storage."""

    def init_fn(params):
        return ScaleByAdam8bitState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(
                lambda p: _quantize(jnp.zeros_like(p, jnp.float32), block),
                params,
            ),
            nu=jax.tree.map(
                lambda p: _quantize_log(jnp.zeros_like(p, jnp.float32), block),
                params,
            ),
        )

    # Per-chunk element budget for the fused update below. 2^21 f32 = 8 MB
    # per dequantized temp; a 1280x10240 kernel (13.1M elems) otherwise
    # holds ~5 x 52 MB of f32 temps at once PER LEAF, and XLA interleaves
    # several leaves' updates with the backward — measured as ~780 MB of
    # anonymous f32 copies in the r4 stage-2 OOM dumps.
    CHUNK_ELEMS = 2**21

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def rows_of(x, rows, fill):
            """Padded (rows, block) f32/int8 view of a flat tensor."""
            flat = x.reshape(-1)
            pad = rows * block - flat.size
            return jnp.pad(flat, (0, pad), constant_values=fill).reshape(
                rows, block
            )

        def chunk_body(args):
            """One chunk of quant-block rows: dequant -> moment update ->
            Adam direction -> requant. All temps are chunk-sized."""
            g_r, mq_r, msc_r, nq_r, nhi_r = args
            m = mq_r.astype(jnp.float32) * msc_r[:, None]
            m = b1 * m + (1 - b1) * g_r
            logx = (nq_r.astype(jnp.float32) + 128.0) / 255.0 * _LOG_SPAN + (
                nhi_r[:, None] - _LOG_SPAN
            )
            v = jnp.where(nq_r.astype(jnp.float32) <= -127.5, 0.0, jnp.exp(logx))
            v = b2 * v + (1 - b2) * g_r**2
            upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            # requant m (linear absmax)
            absmax = jnp.max(jnp.abs(m), axis=1)
            msc = jnp.where(absmax > 0, absmax / 127.0, 1.0)
            mq = jnp.clip(jnp.round(m / msc[:, None]), -127, 127).astype(jnp.int8)
            # requant v (log space)
            logv = jnp.log(jnp.maximum(v, _TINY))
            hi = jnp.max(logv, axis=1)
            rel = (logv - (hi[:, None] - _LOG_SPAN)) / _LOG_SPAN
            nq = jnp.clip(jnp.round(rel * 255.0) - 128.0, -128, 127).astype(
                jnp.int8
            )
            return upd, mq, msc, nq, hi

        def leaf(g, mu_q, nu_q):
            g32 = g.astype(jnp.float32)
            if mu_q.q.dtype != jnp.int8:  # fp32 passthrough leaf
                m = b1 * mu_q.q + (1 - b1) * g32
                v = b2 * nu_q.q + (1 - b2) * g32**2
                upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                return _LeafOut(upd, _Q(m, mu_q.scales), _Q(v, nu_q.scales))
            shape = g.shape
            rows = -(-g.size // block)
            chunk_rows = max(1, CHUNK_ELEMS // block)
            n_chunks = -(-rows // chunk_rows)
            rows_p = n_chunks * chunk_rows

            def crop_rows(x, fill=0):
                r = rows_of(x, rows, fill)
                return jnp.pad(r, ((0, rows_p - rows), (0, 0)),
                               constant_values=fill)

            def crop_scales(s, fill):
                return jnp.pad(s, (0, rows_p - rows), constant_values=fill)

            operands = (
                crop_rows(g32),
                crop_rows(mu_q.q),
                crop_scales(mu_q.scales, 1.0),
                crop_rows(nu_q.q, fill=-128),
                crop_scales(nu_q.scales, 0.0),
            )
            if n_chunks == 1:
                upd, mq, msc, nq, nhi = chunk_body(operands)
            else:
                chunked = tuple(
                    o.reshape((n_chunks, chunk_rows) + o.shape[1:])
                    for o in operands
                )
                upd, mq, msc, nq, nhi = jax.lax.map(chunk_body, chunked)
                upd = upd.reshape(rows_p, block)
                mq = mq.reshape(rows_p, block)
                nq = nq.reshape(rows_p, block)
                msc = msc.reshape(rows_p)
                nhi = nhi.reshape(rows_p)

            def unflat(r):
                return r[:rows].reshape(-1)[: g.size].reshape(shape)

            return _LeafOut(
                unflat(upd),
                _Q(unflat(mq), msc[:rows]),
                _Q(unflat(nq), nhi[:rows]),
            )

        is_q = lambda x: isinstance(x, _Q)  # noqa: E731
        out = jax.tree.map(leaf, updates, state.mu, state.nu, is_leaf=is_q)
        three = lambda i: jax.tree.map(  # noqa: E731
            lambda t: t[i], out, is_leaf=lambda x: isinstance(x, _LeafOut)
        )
        new_updates, new_mu, new_nu = three(0), three(1), three(2)
        return new_updates, ScaleByAdam8bitState(
            count=count, mu=new_mu, nu=new_nu
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    block: int = BLOCK,
) -> optax.GradientTransformation:
    """Drop-in for optax.adamw with 8-bit moment storage (AdamW split:
    decay is applied to params, not the adapted gradient)."""
    return optax.chain(
        scale_by_adam_8bit(b1, b2, eps, block),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
