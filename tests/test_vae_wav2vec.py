"""VAE and wav2vec2 component tests (tiny configs, torch as oracle where an
exact reference formula exists)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hallo_tpu.config import VAEConfig, Wav2Vec2Config
from hallo_tpu.models.vae import AutoencoderKL
from hallo_tpu.models.wav2vec import Wav2Vec2, linear_resample, normalize_waveform

TINY_VAE = VAEConfig(
    block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4
)


def test_vae_shapes_and_roundtrip_finite():
    model = AutoencoderKL(TINY_VAE)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    z = jax.jit(lambda p, x: model.apply(p, x, method=model.encode_mean))(params, x)
    assert z.shape == (2, 4, 4, 4)  # /8 spatial, 4 latent channels
    y = jax.jit(lambda p, z: model.apply(p, z, method=model.decode))(params, z)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_linear_resample_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 13, 5)).astype(np.float32)
    for out_len in (7, 13, 29):
        got = np.asarray(linear_resample(jnp.asarray(x), out_len))
        want = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).transpose(1, 2),
                size=out_len,
                mode="linear",
                align_corners=True,
            )
            .transpose(1, 2)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalize_waveform():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(2.0, 3.0, size=(1, 1000)).astype(np.float32))
    n = np.asarray(normalize_waveform(w))
    assert abs(n.mean()) < 1e-4 and abs(n.std() - 1) < 1e-3


def test_wav2vec_tiny_shapes():
    cfg = Wav2Vec2Config(
        conv_dim=(8, 8),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=32,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    model = Wav2Vec2(cfg)
    wave = jnp.asarray(np.random.default_rng(3).normal(size=(1, 1600)).astype(np.float32))
    fn = jax.jit(lambda p, w: model.apply(p, w, seq_len=10))
    params = jax.jit(lambda k, w: model.init(k, w, seq_len=10))(
        jax.random.PRNGKey(0), wave
    )
    out = fn(params, wave)
    assert out.shape == (1, 10, 2, 16)
    assert np.isfinite(np.asarray(out)).all()
