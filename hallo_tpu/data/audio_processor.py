"""Driving-audio preprocessing: load, (optional) vocal separation, resample,
wav2vec2 embedding.

Reference: hallo/datasets/audio_processor.py:22-177. Differences, TPU/host:
- WAV loading + resampling use scipy (no librosa/ffmpeg dependency);
  resampling is polyphase (scipy.signal.resample_poly).
- MDX-Net vocal separation is optional and gated on `audio_separator`
  availability, like the reference's `audio_separator=None` path
  (audio_processor.py:68-70).
- The wav2vec2 encoder runs in JAX on-device (hallo_tpu.models.wav2vec) and
  returns the stacked 12 layer states (audio_processor.py:118-127).
"""

from __future__ import annotations

import math
import wave
from fractions import Fraction
from typing import Optional, Tuple

import numpy as np


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Load a WAV file to float32 mono in [-1, 1]. Uses scipy (handles
    most PCM encodings); falls back to the stdlib wave module."""
    try:
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        data = np.asarray(data)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 2:
            data = data.mean(axis=1)
        return data, int(sr)
    except Exception:
        with wave.open(path, "rb") as f:
            sr = f.getframerate()
            n = f.getnframes()
            raw = f.readframes(n)
            data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
            if f.getnchannels() == 2:
                data = data.reshape(-1, 2).mean(axis=1)
            return data, sr


def resample(wave_data: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (replaces the ffmpeg subprocess,
    util.py:668-674)."""
    if sr == target_sr:
        return wave_data
    from scipy.signal import resample_poly

    frac = Fraction(target_sr, sr).limit_denominator(1000)
    return resample_poly(wave_data, frac.numerator, frac.denominator).astype(
        np.float32
    )


class AudioProcessor:
    """WAV file -> per-video-frame wav2vec2 embeddings (T, 12, 768)."""

    def __init__(
        self,
        sample_rate: int = 16000,
        fps: int = 25,
        wav2vec_params=None,
        wav2vec_config=None,
        device_fn=None,
        audio_separator_model_path: Optional[str] = None,
        only_last_features: bool = False,
    ):
        self.sample_rate = sample_rate
        self.fps = fps
        self.only_last_features = only_last_features
        self.audio_separator = None
        self._mdx_jax = None
        if audio_separator_model_path:
            try:  # optional ONNX vocal separator (MDX-Net Kim_Vocal_2)
                from audio_separator.separator import Separator  # type: ignore

                self.audio_separator = Separator(
                    output_single_stem="vocals",
                )
                self.audio_separator.load_model(audio_separator_model_path)
            except Exception:
                self.audio_separator = None
            if self.audio_separator is None:
                # Same .onnx file through the JAX executor (no onnxruntime).
                import os

                if os.path.isfile(audio_separator_model_path):
                    try:
                        from hallo_tpu.data.mdx_separator import MdxSeparatorJax

                        self._mdx_jax = MdxSeparatorJax(
                            audio_separator_model_path, output_sr=sample_rate
                        )
                    except Exception as e:  # unsupported graph/op -> skip
                        import logging

                        logging.getLogger(__name__).warning(
                            "MDX-Net JAX separator unavailable (%s); "
                            "proceeding without vocal separation", e
                        )

        if wav2vec_params is None:
            raise ValueError("wav2vec_params (converted HF weights) required")
        import jax

        from hallo_tpu.config import Wav2Vec2Config
        from hallo_tpu.models.wav2vec import Wav2Vec2

        self._model = Wav2Vec2(wav2vec_config or Wav2Vec2Config())
        self._params = wav2vec_params
        self._encode = jax.jit(
            lambda p, w, seq_len: self._model.apply(p, w, seq_len=seq_len),
            static_argnames=("seq_len",),
        )

    def preprocess(
        self, wav_path: str, clip_length: int = -1
    ) -> Tuple[np.ndarray, int]:
        """Returns (audio_emb (T, 12, 768), true frame count) with T padded to
        a clip multiple (audio_processor.py:76-129)."""
        from hallo_tpu.models.wav2vec import normalize_waveform

        data, sr = load_wav(wav_path)
        if self.audio_separator is not None:
            try:
                data = self._separate_vocals(wav_path)
                sr = self.sample_rate
            except Exception:
                pass
        elif self._mdx_jax is not None:
            data = self._mdx_jax.separate(data, sr)
            sr = self.sample_rate
        data = resample(data, sr, self.sample_rate)
        data = np.asarray(normalize_waveform(data[None]))[0]

        seq_len = math.ceil(len(data) / self.sample_rate * self.fps)
        audio_length = seq_len
        if clip_length > 0 and seq_len % clip_length != 0:
            pad_frames = clip_length - seq_len % clip_length
            data = np.pad(
                data,
                (0, pad_frames * (self.sample_rate // self.fps)),
                constant_values=0.0,
            )
            seq_len += pad_frames

        emb = self._encode(self._params, data[None], seq_len)  # (1, T, 12, 768)
        emb = np.asarray(emb)[0]
        if self.only_last_features:
            emb = emb[:, -1]
        return emb, audio_length

    def _separate_vocals(self, wav_path: str) -> np.ndarray:
        outputs = self.audio_separator.separate(wav_path)
        if not outputs:
            raise RuntimeError("audio separation failed")
        import os

        out = os.path.join(self.audio_separator.output_dir, outputs[0])
        data, sr = load_wav(out)
        return resample(data, sr, self.sample_rate)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False
