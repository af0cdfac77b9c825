"""Expected ONNX op inventories of the production model files.

The reference pipeline runs three .onnx models through onnxruntime
(image_processor.py:100-138 via insightface, audio_processor.py:50-64 via
audio-separator); hallo_tpu runs them through `convert.onnx_jax.OnnxExecutor`
instead. These are the op sets those model families are known to use
(public Netron inspections of the insightface `antelopev2`/`buffalo_l`
bundles and the MDX-Net vocal models) — recorded as a *coverage contract*:
`tests/test_onnx_jax.py` asserts the executor supports every op listed
here, so loading the real files cannot fail on op dispatch. When the real
files are present, the gated test runs `OnnxExecutor.check_support` on the
actual graphs (the authoritative check — inventories here are the
documented expectation, superset-safe).
"""

from __future__ import annotations

# SCRFD-10G with batchnorm + 5 keypoints (face detector).
# ResNet-style backbone + PAFPN neck + per-stride heads; score sigmoid is
# in-graph, bbox/kps decode + NMS are outside (data/insight_jax.py).
SCRFD_10G_BNKPS = frozenset({
    "Conv", "BatchNormalization", "Relu", "PRelu", "Add", "Mul", "Div",
    "Sub", "MaxPool", "AveragePool", "GlobalAveragePool", "Sigmoid",
    "Concat", "Reshape", "Transpose", "Shape", "Gather", "Unsqueeze",
    "Squeeze", "Slice", "Resize", "Upsample", "Exp", "Identity",
    "Constant", "Softmax", "Flatten",
})

# ArcFace iResNet-100 (512-d identity embedding).
GLINTR100 = frozenset({
    "Conv", "BatchNormalization", "PRelu", "Add", "Flatten", "Gemm",
    "MatMul", "Reshape", "Identity", "Constant", "Dropout",
})

# MDX-Net vocal separator (Kim_Vocal_2): Conv/ConvTranspose U-Net with
# TDF (frequency-dense) blocks; STFT/iSTFT live OUTSIDE the graph
# (data/mdx_separator.py re-derives them in jnp).
KIM_VOCAL_2 = frozenset({
    "Conv", "ConvTranspose", "BatchNormalization", "InstanceNormalization",
    "Relu", "LeakyRelu", "Add", "Concat", "Reshape", "Transpose", "MatMul",
    "Gemm", "Sigmoid", "Tanh", "Mul", "Slice", "Identity", "Constant",
    "Shape", "Unsqueeze", "Squeeze", "Gather", "Cast",
})

KNOWN_MODEL_OPS = {
    "scrfd_10g_bnkps": SCRFD_10G_BNKPS,
    "glintr100": GLINTR100,
    "Kim_Vocal_2": KIM_VOCAL_2,
}
