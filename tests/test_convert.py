"""Weight-converter tests with real PyTorch modules as oracles.

The wav2vec2 test is a true golden test: a randomly-initialized HF
Wav2Vec2Model's state dict is converted and the JAX model must reproduce the
HF hidden states. The projection/face-locator tests build the torch modules
per the reference architecture (image_proj.py:23-76, audio_proj.py:40-124,
face_locator.py:34-113) and check numeric parity after conversion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from hallo_tpu.config import (
    AudioProjConfig,
    FaceLocatorConfig,
    ImageProjConfig,
    Wav2Vec2Config,
)
from hallo_tpu.convert import torch_to_jax as cv
from hallo_tpu.models.face_locator import FaceLocator
from hallo_tpu.models.projections import AudioProj, ImageProj
from hallo_tpu.models.wav2vec import Wav2Vec2


def test_image_proj_conversion_parity():
    torch.manual_seed(0)
    proj = torch.nn.Linear(16, 4 * 12)
    norm = torch.nn.LayerNorm(12)
    sd = {f"proj.{k}": v for k, v in proj.state_dict().items()}
    sd.update({f"norm.{k}": v for k, v in norm.state_dict().items()})

    model = ImageProj(ImageProjConfig(cross_attention_dim=12, clip_embeddings_dim=16))
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))
    params, report = cv.convert_image_proj(sd, init)
    assert not report["missing_in_ckpt"], report["missing_in_ckpt"]
    assert not report["unmapped_ckpt_keys"]

    x = np.random.default_rng(0).normal(size=(2, 16)).astype(np.float32)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        want = norm(proj(torch.from_numpy(x)).reshape(-1, 4, 12)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_audio_proj_conversion_parity():
    torch.manual_seed(1)
    cfg = AudioProjConfig(seq_len=3, blocks=2, channels=4, intermediate_dim=8,
                          output_dim=6, context_tokens=5)
    in_dim = 3 * 2 * 4
    p1, p2 = torch.nn.Linear(in_dim, 8), torch.nn.Linear(8, 8)
    p3, nrm = torch.nn.Linear(8, 5 * 6), torch.nn.LayerNorm(6)
    sd = {}
    for name, mod in (("proj1", p1), ("proj2", p2), ("proj3", p3), ("norm", nrm)):
        sd.update({f"{name}.{k}": v for k, v in mod.state_dict().items()})

    model = AudioProj(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 3, 2, 4)))
    params, report = cv.convert_audio_proj(sd, init)
    assert not report["missing_in_ckpt"] and not report["unmapped_ckpt_keys"]

    x = np.random.default_rng(1).normal(size=(1, 2, 3, 2, 4)).astype(np.float32)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        xt = torch.from_numpy(x).reshape(2, in_dim)
        h = torch.relu(p1(xt))
        h = torch.relu(p2(h))
        want = nrm(p3(h).reshape(2, 5, 6)).reshape(1, 2, 5, 6).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_face_locator_conversion_parity():
    torch.manual_seed(2)
    cfg = FaceLocatorConfig(
        conditioning_embedding_channels=8, block_out_channels=(4, 8)
    )
    conv_in = torch.nn.Conv2d(3, 4, 3, padding=1)
    block0 = torch.nn.Conv2d(4, 4, 3, padding=1)
    block1 = torch.nn.Conv2d(4, 8, 3, padding=1, stride=2)
    conv_out = torch.nn.Conv2d(8, 8, 3, padding=1)
    with torch.no_grad():
        conv_out.weight.zero_(); conv_out.bias.zero_()
        conv_out.weight.add_(torch.randn_like(conv_out.weight) * 0.02)
    sd = {}
    for name, mod in (("conv_in", conv_in), ("blocks.0", block0),
                      ("blocks.1", block1), ("conv_out", conv_out)):
        sd.update({f"{name}.{k}": v for k, v in mod.state_dict().items()})

    model = FaceLocator(cfg)
    x = np.random.default_rng(2).normal(size=(1, 2, 16, 16, 3)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, report = cv.convert_face_locator(sd, init)
    assert not report["missing_in_ckpt"] and not report["unmapped_ckpt_keys"]

    got = np.asarray(model.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        xt = torch.from_numpy(x).reshape(2, 16, 16, 3).permute(0, 3, 1, 2)
        h = torch.nn.functional.silu(conv_in(xt))
        h = torch.nn.functional.silu(block0(h))
        h = torch.nn.functional.silu(block1(h))
        want = conv_out(h).permute(0, 2, 3, 1).reshape(1, 2, 8, 8, 8).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_wav2vec_conversion_golden_vs_hf():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    hf_cfg = HFConfig(
        vocab_size=32,
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=32,
        conv_dim=(8, 8),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(3)
    hf = HFModel(hf_cfg).eval()

    wave = np.random.default_rng(3).normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(wave), output_hidden_states=True)
    want = torch.stack(out.hidden_states[1:], dim=2).numpy()  # (1, T, L, C)
    t_len = want.shape[1]

    cfg = Wav2Vec2Config(
        conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    model = Wav2Vec2(cfg)
    init = jax.jit(lambda k, w: model.init(k, w, seq_len=t_len))(
        jax.random.PRNGKey(0), jnp.asarray(wave)
    )
    params, report = cv.convert_wav2vec(hf.state_dict(), init)
    assert not report["missing_in_ckpt"], report["missing_in_ckpt"][:8]
    assert not report["unmapped_ckpt_keys"], report["unmapped_ckpt_keys"][:8]

    # seq_len == conv output length -> the interposed resample is identity,
    # so outputs must match HF exactly.
    got = np.asarray(
        jax.jit(lambda p, w: model.apply(p, w, seq_len=t_len))(
            params, jnp.asarray(wave)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)
