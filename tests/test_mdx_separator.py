"""MDX-Net-on-JAX vocal separation tests (reference audio_processor.py:56-70
runs Kim_Vocal_2.onnx through onnxruntime; here the same file format runs
through OnnxExecutor with a re-derived STFT/overlap-add pipeline)."""

import numpy as np
import torch
import torch.nn.functional as F

from hallo_tpu.convert.onnx_io import OnnxNode, save_onnx
from hallo_tpu.convert.onnx_jax import OnnxExecutor
from hallo_tpu.data.mdx_separator import MdxSeparatorJax, istft, stft


def _node(op, inputs, outputs, **attrs):
    return OnnxNode(op, list(inputs), list(outputs), attrs)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 40000)).astype(np.float32)
    spec = stft(x, n_fft=512, hop=128)
    assert spec.shape == (2, 257, 1 + 40000 // 128)
    y = istft(spec, n_fft=512, hop=128, length=40000)
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_convtranspose_instancenorm_vs_torch(tmp_path):
    rng = np.random.default_rng(1)
    w_d = rng.normal(size=(6, 3, 3, 3), scale=0.3).astype(np.float32)  # down
    w_u = rng.normal(size=(6, 3, 4, 4), scale=0.3).astype(np.float32)  # up (I,O,kh,kw)
    b_u = rng.normal(size=(3,)).astype(np.float32)
    in_s = rng.uniform(0.5, 1.5, 6).astype(np.float32)
    in_b = rng.normal(size=(6,)).astype(np.float32)
    nodes = [
        _node("Conv", ["x", "w_d"], ["d"], strides=[2, 2], pads=[1, 1, 1, 1]),
        _node("InstanceNormalization", ["d", "in_s", "in_b"], ["n"],
              epsilon=1e-5),
        _node("Relu", ["n"], ["r"]),
        _node("ConvTranspose", ["r", "w_u", "b_u"], ["y"], strides=[2, 2],
              pads=[1, 1, 1, 1]),
    ]
    path = str(tmp_path / "ct.onnx")
    save_onnx(path, nodes, dict(w_d=w_d, w_u=w_u, b_u=b_u, in_s=in_s, in_b=in_b),
              {"x": [1, 3, 16, 16]}, {"y": [1, 3, 16, 16]})
    ex = OnnxExecutor(path)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    out = np.asarray(ex(ex.params, {"x": x})["y"])
    with torch.no_grad():
        t = torch.from_numpy(x)
        d = F.conv2d(t, torch.from_numpy(w_d), stride=2, padding=1)
        n = F.instance_norm(d, weight=torch.from_numpy(in_s),
                            bias=torch.from_numpy(in_b), eps=1e-5)
        r = F.relu(n)
        ref = F.conv_transpose2d(r, torch.from_numpy(w_u),
                                 torch.from_numpy(b_u), stride=2, padding=1)
    assert out.shape == tuple(ref.shape)
    np.testing.assert_allclose(out, ref.numpy(), rtol=2e-4, atol=2e-4)


def _identity_mdx(path: str, dim_f: int = 64, dim_t: int = 32) -> None:
    save_onnx(path, [_node("Identity", ["x"], ["y"])], {},
              {"x": [1, 4, dim_f, dim_t]}, {"y": [1, 4, dim_f, dim_t]})


def test_mdx_identity_model_reconstructs_audio(tmp_path):
    """An identity spectrogram 'model' must reproduce the (band-limited)
    input through the full chunked STFT -> model -> overlap-add -> ISTFT
    pipeline — validates the spectrogram bookkeeping end to end."""
    path = str(tmp_path / "mdx_id.onnx")
    _identity_mdx(path)
    sep = MdxSeparatorJax(path, hop=40, output_sr=16000)
    assert sep.dim_f == 64 and sep.dim_t == 32 and sep.n_fft == 160

    sr = 44100
    t = np.arange(int(1.5 * sr)) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = sep.separate(x, sr)
    assert out.dtype == np.float32
    expect_len = round(len(x) * 16000 / 44100)
    assert abs(len(out) - expect_len) <= 4
    # compare against the directly-resampled input (identity separation)
    from hallo_tpu.data.audio_processor import resample

    ref = resample(x, sr, 16000)
    n = min(len(out), len(ref))
    err = np.sqrt(np.mean((out[:n] - ref[:n]) ** 2))
    assert err < 0.02, err


def test_mdx_tiny_unet_runs(tmp_path):
    """A conv/instancenorm/convtranspose UNet stands in for Kim_Vocal_2:
    checks the executor handles the MDX op family inside the pipeline."""
    rng = np.random.default_rng(2)
    nodes = [
        _node("Conv", ["x", "w1"], ["d"], strides=[2, 2], pads=[1, 1, 1, 1]),
        _node("InstanceNormalization", ["d", "s1", "b1"], ["n1"]),
        _node("Relu", ["n1"], ["r1"]),
        _node("ConvTranspose", ["r1", "w2"], ["u"], strides=[2, 2],
              pads=[1, 1, 1, 1], output_padding=[1, 1]),
        _node("Conv", ["u", "w3"], ["y"]),
    ]
    inits = dict(
        w1=rng.normal(size=(8, 4, 3, 3), scale=0.2).astype(np.float32),
        s1=np.ones(8, np.float32), b1=np.zeros(8, np.float32),
        w2=rng.normal(size=(8, 8, 3, 3), scale=0.2).astype(np.float32),
        w3=rng.normal(size=(4, 8, 1, 1), scale=0.2).astype(np.float32),
    )
    path = str(tmp_path / "mdx_unet.onnx")
    save_onnx(path, nodes, inits, {"x": [1, 4, 64, 32]}, {"y": [1, 4, 64, 32]})
    sep = MdxSeparatorJax(path, hop=40, output_sr=16000)
    x = np.random.default_rng(3).normal(size=22050).astype(np.float32) * 0.1
    out = sep.separate(x, 22050)
    assert np.isfinite(out).all()
    assert out.ndim == 1 and len(out) > 10000
