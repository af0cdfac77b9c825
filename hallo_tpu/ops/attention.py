"""Attention op with pluggable backends.

This replaces the reference's xformers CUDA memory-efficient attention
(reference: hallo/models/motion_module.py:58-59,507-551 and diffusers
`Attention`) with:

- "xla": a plain jnp formulation that XLA fuses well on TPU (always correct,
  used on CPU test meshes and as the numerics oracle), softmax in fp32.
- "pallas": a fused flash-attention kernel (hallo_tpu/ops/pallas_flash.py)
  tiled for the MXU, used for the hot spatial layouts on TPU.

Layout: q/k/v are (B, H, L, D) — heads-major. Producers emit this layout
directly from their QKV projections (einsum epilogue) so no standalone
transpose materializes between projection and attention (xprof showed ~8%
of the denoiser step in such "data formatting" before this).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = os.environ.get("HALLO_TPU_ATTENTION", "auto")


def set_default_attention_backend(backend: str) -> None:
    global _DEFAULT_BACKEND
    assert backend in ("auto", "xla", "pallas")
    _DEFAULT_BACKEND = backend


def _resolve_backend(backend: Optional[str]) -> str:
    backend = backend or _DEFAULT_BACKEND
    if backend != "auto":
        return backend
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    scale: float,
) -> jax.Array:
    # (B, H, Lq, D) x (B, H, Lk, D) -> (B, H, Lq, Lk)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    """Multi-head scaled dot-product attention, heads-major layout.

    Args:
      q: (B, H, Lq, D)
      k, v: (B, H, Lk, D)
      bias: optional additive logits bias broadcastable to (B, H, Lq, Lk).
        Used for the CFG-uncond "no reference KV" masking
        (reference: hallo/models/mutual_self_attention.py:264-284).
      scale: defaults to D**-0.5.

    Returns:
      (B, H, Lq, D) in v.dtype.
    """
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    resolved = _resolve_backend(backend)
    if resolved == "pallas":
        # Measured on v5e: the fused kernel wins whenever the query side is
        # long — large spatial self-attention (where materializing scores
        # OOMs at 4096x8192) AND small-KV cross-attention (audio 32 tokens,
        # identity 4 tokens), where the win is skipping the HBM round-trip
        # of the scores tensor. Tiny-seq layouts (temporal, Lq = 16-18
        # frames over a huge batch) stay on the dedicated XLA formulation.
        lq, lk = q.shape[2], k.shape[2]
        if lq >= 256 and lk >= 4:
            from hallo_tpu.ops import pallas_flash

            if bias is not None and bias.ndim == 4 and (
                bias.shape[1] != 1 or bias.shape[2] != 1
            ):
                return _xla_attention(q, k, v, bias, scale)  # general bias
            flat_bias = None if bias is None else bias.reshape(bias.shape[0], -1)
            # HALLO_INT8_ATTN=1: int8 QK^T scores for the long spatial
            # layouts (2x MXU rate; ~0.5% score error — LPIPS-level parity,
            # not bitwise). Off by default.
            quant = "int8" if os.environ.get("HALLO_INT8_ATTN") == "1" else None
            return pallas_flash.flash_attention(
                q, k, v, bias=flat_bias, scale=scale, quant=quant
            )
    return _xla_attention(q, k, v, bias, scale)
