"""hallo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) audio-driven portrait animation framework.

A from-scratch rebuild of the capabilities of fudan-generative-vision/hallo
(reference: /root/reference, arXiv 2406.08801) designed TPU-first:

- channels-last (NHWC) layouts, bf16 compute on the MXU, fp32 params
- pure-functional two-phase reference-feature API instead of monkey-patched
  attention hooks (reference: hallo/models/mutual_self_attention.py)
- Pallas flash-attention kernels for the spatial / temporal / audio attention
  layouts (replacing xformers CUDA kernels)
- jax.sharding Mesh + pjit for data/fsdp/tensor parallel training (replacing
  HF Accelerate + DeepSpeed ZeRO-2 / NCCL)
- DDIM (zero-SNR, v-prediction, trailing) sampler as pure jnp functions
"""

__version__ = "0.1.0"
