"""End-to-end CLI smoke: `scripts/inference.py` with a tiny yaml config,
a synthetic portrait PNG, and a synthetic WAV — exercising the FULL public
surface (config load + CLI merge, host preprocessing fallbacks, random-init
smoke weights, windowed audio, sliding-window pipeline, video writer).

Reference surface: scripts/inference.py:118-376."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY_YAML = """
source_image: null
driving_audio: null
weight_dtype: fp32
enable_zero_snr: true
inference_steps: 2
cfg_scale: 3.5
pose_weight: 1.0
face_weight: 1.0
lip_weight: 1.0
face_expand_ratio: 1.2
audio_ckpt_dir: ""
base_model_path: ""
motion_module_path: ""
data:
  n_sample_frames: 4
  n_motion_frames: 2
  source_image:
    width: 64
    height: 64
  driving_audio:
    sample_rate: 16000
  export_video:
    fps: 25
vae:
  model_path: ""
wav2vec:
  model_path: ""
  features: all
audio_separator:
  model_path: ""
face_analysis:
  model_path: ""
noise_scheduler_kwargs:
  num_train_timesteps: 1000
  beta_start: 0.00085
  beta_end: 0.012
  beta_schedule: linear
  prediction_type: v_prediction
  timestep_spacing: trailing
unet_additional_kwargs:
  block_out_channels: [32, 32, 32, 32]
  layers_per_block: 1
  num_attention_heads: 2
  cross_attention_dim: 64
  audio_attention_dim: 64
  norm_num_groups: 8
  use_motion_module: true
  use_audio_module: true
  stack_enable_blocks_name: [up, down, mid]
  stack_enable_blocks_depth: [0, 1, 2, 3]
  motion_module_kwargs:
    num_attention_heads: 2
    num_transformer_block: 1
    temporal_position_encoding: true
    temporal_position_encoding_max_len: 16
    temporal_attention_dim_div: 1
    norm_num_groups: 8
"""


@pytest.mark.slow
def test_cli_inference_smoke(tmp_path):
    import cv2
    from scipy.io import wavfile

    # synthetic 64x64 "portrait" and 0.32 s of audio (8 frames @ 25 fps)
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    cv2.circle(img, (32, 28), 14, (200, 170, 150), -1)  # a face-ish blob
    img_path = str(tmp_path / "face.png")
    cv2.imwrite(img_path, img)

    sr = 16000
    t = np.arange(int(0.32 * sr)) / sr
    wave = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_path = str(tmp_path / "voice.wav")
    wavfile.write(wav_path, sr, wave)

    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML)

    from scripts.inference import inference_process

    out_path = str(tmp_path / "out.mp4")
    args = argparse.Namespace(
        config=cfg_path,
        source_image=img_path,
        driving_audio=wav_path,
        output=out_path,
        pose_weight=None,
        face_weight=None,
        lip_weight=None,
        face_expand_ratio=None,
        audio_ckpt_dir=None,
        # wav2vec weights are absent in this env: smoke mode is an explicit
        # opt-in now (random-init embeddings otherwise hard-fail like net.pth)
        allow_partial=True,
    )
    result = inference_process(args)
    assert os.path.exists(result), result
    assert os.path.getsize(result) > 0

    frames = None
    from hallo_tpu.utils.video import read_frames

    frames = read_frames(result)
    assert len(frames) == 8, len(frames)  # trimmed to the true audio length
    assert frames[0].shape == (64, 64, 3)


@pytest.mark.slow
def test_speed_profile_definitions():
    """Pin the named speed profiles to their audited definitions (BASELINE.md
    r4 speed/quality matrix): fast = unipc @ 12 evals + CFG-uncond cache
    stride 3 (measured dominating dpm++2m @ 15 on PSNR/SSIM AND speed at
    every seed/size); turbo = fast + the dynamic step cache."""
    from scripts.inference import PROFILE_DEFAULTS

    assert set(PROFILE_DEFAULTS) == {"exact", "fast", "turbo"}
    assert PROFILE_DEFAULTS["exact"] == {}
    # r5: grid-nested pure-UniPC profiles (BASELINE.md r5 512² matrix:
    # 10 and 8 evals on the 1000/S trailing grids whose knots nest into
    # the 40-step exact grid; caching measured 3-4 dB worse there).
    fast = PROFILE_DEFAULTS["fast"]
    assert (fast["sampler"], fast["inference_steps"]) == ("unipc", 10)
    assert "cfg_cache_stride" not in fast and "step_cache" not in fast
    turbo = PROFILE_DEFAULTS["turbo"]
    assert (turbo["sampler"], turbo["inference_steps"]) == ("unipc", 8)
    assert "step_cache" not in turbo
