"""MDX-Net vocal separation through the JAX ONNX executor.

The reference optionally strips background music from the driving audio
with an MDX-Net model (`Kim_Vocal_2.onnx`) via the `audio-separator`
package (onnxruntime) — audio_processor.py:56-70, with a documented
separator=None fallback. This module runs the SAME .onnx file through
`hallo_tpu.convert.onnx_jax.OnnxExecutor`, re-implementing the thin
spectrogram pipeline around it:

  waveform -> stereo 44.1 kHz -> STFT (hann, centered) -> stack
  [Re_L, Re_R, Im_L, Im_R] -> (1, 4, dim_f, dim_t) segments ->
  UNet -> masked spectrogram -> ISTFT -> overlap-add -> vocals

Model geometry (dim_f, dim_t) is read from the graph's input shape; the
FFT size follows the public UVR/MDX convention n_fft = 2.5 * dim_f
(Kim_Vocal_2: dim_f 3072, n_fft 7680, hop 1024) and can be overridden.

Chunks are processed with 50% overlap and a triangular crossfade — the
same principle as audio-separator's overlap-add (exact window bookkeeping
re-derived, not copied).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# STFT / ISTFT (numpy, hann, centered — torch.stft conventions)


def _hann(n: int) -> np.ndarray:
    # periodic hann (torch.hann_window default), float64 for exact COLA
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(C, T) -> complex (C, n_fft//2+1, frames); centered, reflect-padded."""
    pad = n_fft // 2
    x = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[:, idx] * _hann(n_fft)  # (C, frames, n_fft)
    return np.fft.rfft(frames, axis=-1).transpose(0, 2, 1)


def istft(spec: np.ndarray, n_fft: int, hop: int, length: int) -> np.ndarray:
    """complex (C, n_fft//2+1, frames) -> (C, length); least-squares
    overlap-add inverse with hann synthesis window."""
    win = _hann(n_fft)
    frames = np.fft.irfft(spec.transpose(0, 2, 1), n=n_fft, axis=-1)
    c, n_frames = frames.shape[0], frames.shape[1]
    total = n_fft + hop * (n_frames - 1)
    out = np.zeros((c, total))
    norm = np.zeros(total)
    for i in range(n_frames):
        s = i * hop
        out[:, s : s + n_fft] += frames[:, i] * win
        norm[s : s + n_fft] += win ** 2
    out = out / np.maximum(norm, 1e-8)
    pad = n_fft // 2
    return out[:, pad : pad + length]


# ---------------------------------------------------------------------------


class MdxSeparatorJax:
    """Run an MDX-Net stem-separation ONNX model with JAX.

    `separate(waveform, sr)` -> (vocals_waveform float32 (T,) mono at
    `output_sr`). Input may be mono or stereo at any rate."""

    MODEL_SR = 44100  # MDX models are trained at 44.1 kHz stereo

    def __init__(
        self,
        model_path: str,
        n_fft: Optional[int] = None,
        hop: int = 1024,
        output_sr: int = 16000,
    ):
        from hallo_tpu.convert.onnx_jax import OnnxExecutor

        self.exec = OnnxExecutor(model_path)
        self.input_name = self.exec.input_names[0]
        shape = dict(self.exec.graph.inputs)[self.input_name]
        if shape is None or len(shape) != 4:
            raise ValueError(f"unexpected MDX input shape {shape}")
        self.dim_f = int(shape[2])
        self.dim_t = int(shape[3])
        self.n_fft = int(n_fft or round(2.5 * self.dim_f))
        self.hop = hop
        self.output_sr = output_sr
        self._jitted = self.exec.jit()

    # -- spectrogram <-> model tensor ----------------------------------
    def _to_model(self, spec: np.ndarray) -> np.ndarray:
        """complex (2, bins, frames) -> float (1, 4, dim_f, frames)."""
        s = spec[:, : self.dim_f]
        return np.concatenate([s.real, s.imag], axis=0)[None].astype(np.float32)

    def _from_model(self, x: np.ndarray, bins: int) -> np.ndarray:
        """(1, 4, dim_f, frames) -> complex (2, bins, frames), zero-padding
        the bins above dim_f (MDX models predict only the kept band)."""
        x = np.asarray(x)[0]
        spec = x[:2] + 1j * x[2:]
        out = np.zeros((2, bins, spec.shape[-1]), np.complex128)
        out[:, : self.dim_f] = spec
        return out

    # -- main -----------------------------------------------------------
    def separate(self, waveform: np.ndarray, sr: int) -> np.ndarray:
        from hallo_tpu.data.audio_processor import resample

        wav = np.asarray(waveform, np.float32)
        if wav.ndim == 1:
            wav = np.stack([wav, wav])
        else:
            wav = wav.T if wav.shape[0] > 2 else wav
        wav = np.stack([resample(w, sr, self.MODEL_SR) for w in wav])

        length = wav.shape[1]
        spec = stft(wav, self.n_fft, self.hop)  # (2, bins, frames)
        bins, frames = spec.shape[1], spec.shape[2]

        seg = self.dim_t
        hop_seg = max(1, seg // 2)  # 50% overlap
        if frames < seg:
            spec = np.pad(spec, ((0, 0), (0, 0), (0, seg - frames)))
            frames_p = seg
        else:
            extra = (-(frames - seg)) % hop_seg
            spec = np.pad(spec, ((0, 0), (0, 0), (0, extra)))
            frames_p = spec.shape[2]

        out = np.zeros_like(spec)
        weight = np.zeros(frames_p)
        xfade = np.bartlett(seg + 2)[1:-1] + 1e-3  # triangular crossfade
        for start in range(0, frames_p - seg + 1, hop_seg):
            chunk = spec[:, :, start : start + seg]
            pred = self._jitted(
                self.exec.params, {self.input_name: self._to_model(chunk)}
            )
            pred = self._from_model(
                np.asarray(next(iter(pred.values()))), bins
            )
            out[:, :, start : start + seg] += pred * xfade
            weight[start : start + seg] += xfade
        out = out / np.maximum(weight, 1e-8)

        vocals = istft(out[:, :, :frames], self.n_fft, self.hop, length)
        mono = vocals.mean(axis=0).astype(np.float32)
        return resample(mono, self.MODEL_SR, self.output_sr)
