"""End-to-end wav2vec2 encoder parity vs the real HF torch implementation.

The reference wraps transformers' Wav2Vec2Model and interposes a linear
interpolation of the conv features to the video frame count before the
transformer encoder (reference hallo/models/wav2vec.py:42-66). Here we build
a tiny torch Wav2Vec2Model, replay that exact interposed flow in torch, and
require our JAX encoder (weights loaded through convert.torch_to_jax) to
match the stacked per-layer hidden states.

This covers, in one test: the 7-conv feature extractor's group-norm quirk,
feature projection, the weight-normed positional conv (+ even-kernel
SamePad trim), all encoder layers, and every converter mapping for wav2vec.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from hallo_tpu.config import Wav2Vec2Config
from hallo_tpu.convert import torch_to_jax as cv
from hallo_tpu.models.wav2vec import Wav2Vec2


def _tiny_hf_model():
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32,
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=24,
        conv_dim=(8, 8),
        conv_kernel=(3, 3),
        conv_stride=(2, 2),
        conv_bias=False,
        num_conv_pos_embeddings=4,
        num_conv_pos_embedding_groups=2,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        layer_norm_eps=1e-5,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(7)
    model = transformers.Wav2Vec2Model(hf_cfg).eval()
    return model


def _torch_reference_forward(model, wave: np.ndarray, seq_len: int) -> np.ndarray:
    """Replay reference wav2vec.py:42-66: conv features -> linear
    interpolation to seq_len (align_corners=True) -> projection -> encoder,
    stacking hidden_states[1:] (audio_processor.py:118-127)."""
    with torch.no_grad():
        x = torch.from_numpy(wave)
        feats = model.feature_extractor(x)  # (B, C, T)
        feats = torch.nn.functional.interpolate(
            feats, size=seq_len, align_corners=True, mode="linear"
        ).transpose(1, 2)  # (B, seq_len, C)
        hidden, _ = model.feature_projection(feats)
        out = model.encoder(hidden, output_hidden_states=True)
        stacked = torch.stack(out.hidden_states[1:], dim=2)  # (B, T, L, C)
    return stacked.numpy()


@pytest.mark.slow
def test_wav2vec_encoder_matches_transformers():
    model = _tiny_hf_model()
    cfg = Wav2Vec2Config(
        conv_dim=(8, 8),
        conv_kernel=(3, 3),
        conv_stride=(2, 2),
        conv_bias=False,
        feat_extract_norm="group",
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=24,
        num_conv_pos_embeddings=4,
        num_conv_pos_embedding_groups=2,
        layer_norm_eps=1e-5,
    )
    rng = np.random.default_rng(3)
    wave = rng.standard_normal((2, 400)).astype(np.float32)
    seq_len = 10

    want = _torch_reference_forward(model, wave, seq_len)

    net = Wav2Vec2(cfg)
    init = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 400)), seq_len)
    params, report = cv.convert_wav2vec(model.state_dict(), init, strict=True)
    assert not report["missing_in_ckpt"], report["missing_in_ckpt"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    got = np.asarray(net.apply(params, jnp.asarray(wave), seq_len))

    assert got.shape == want.shape == (2, seq_len, 2, 16)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
