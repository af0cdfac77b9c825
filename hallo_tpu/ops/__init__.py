"""TPU compute ops: attention dispatch and Pallas kernels."""

from hallo_tpu.ops.attention import dot_product_attention, set_default_attention_backend

__all__ = ["dot_product_attention", "set_default_attention_backend"]
