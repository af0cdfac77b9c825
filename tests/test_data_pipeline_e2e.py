"""End-to-end dataset pipeline: synthetic video -> data_preprocess (step 1
masks/frames, step 2 face emb + wav2vec audio emb, smoke weights) ->
extract_meta_info -> TalkingVideoDataset batch.

Reference flow: scripts/data_preprocess.py + extract_meta_info_stage2.py +
hallo/datasets/talk_video.py (SURVEY.md §3.5)."""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_video(path: str, t: int = 20, size: int = 96) -> None:
    import cv2

    wr = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (size, size)
    )
    assert wr.isOpened()
    rng = np.random.default_rng(0)
    base = rng.uniform(40, 200, (size, size, 3)).astype(np.uint8)
    for i in range(t):
        frame = base.copy()
        cv2.circle(frame, (size // 2, size // 2 - 5 + (i % 3)), size // 4,
                   (190, 160, 140), -1)
        wr.write(frame)
    wr.release()


@pytest.mark.slow
def test_data_pipeline_end_to_end(tmp_path):
    from scipy.io import wavfile

    from scripts.data_preprocess import process_single_video
    from hallo_tpu.data.datasets import TalkingVideoDataset

    vid = str(tmp_path / "clip0.mp4")
    _write_video(vid, t=20)
    out_dir = str(tmp_path / "clips")
    os.makedirs(out_dir)

    args = argparse.Namespace(
        size=64,
        face_analysis_model_path="",
        wav2vec_model_path="",
    )
    meta1 = process_single_video(vid, out_dir, 1, args)
    npz_path = meta1["clip_path"]
    data = dict(np.load(npz_path))
    assert data["frames"].shape == (20, 64, 64, 3)
    assert data["face_region"].shape == (64, 64, 3)
    for level, scale in enumerate((8, 16, 32, 64)):
        want = (64 // scale) * (64 // scale)
        for kind in ("full", "face", "lip"):
            assert data[f"{kind}_mask_{level}"].shape[-1] == want, (kind, level)

    # no ffmpeg in this environment: fake the extracted audio track so the
    # step-2 wav2vec branch runs (0.8 s @ 16 kHz = 20 frames @ 25 fps)
    wav = os.path.join(out_dir, "clip0.wav")
    sr = 16000
    tt = np.arange(int(0.8 * sr)) / sr
    wavfile.write(wav, sr, (0.2 * np.sin(2 * np.pi * 330 * tt)).astype(np.float32))
    data["audio_path"] = np.asarray(wav)
    np.savez_compressed(npz_path, **data)

    meta2 = process_single_video(vid, out_dir, 2, args)
    data = dict(np.load(meta2["clip_path"]))
    assert data["face_emb"].shape == (512,)
    assert data["audio_emb"].shape[0] >= 18  # ~20 frames worth
    assert data["audio_emb"].shape[1:] == (12, 768)

    # meta extraction (stage 2 validates frame-vs-audio agreement +-3)
    sys.argv = [
        "extract_meta_info.py", "-i", out_dir, "--stage", "2",
        "-o", str(tmp_path / "meta2.json"),
    ]
    from scripts.extract_meta_info import main as extract_main

    extract_main()
    meta = json.load(open(tmp_path / "meta2.json"))
    assert len(meta) == 1

    # dataset consumes the meta and yields a training item
    ds = TalkingVideoDataset(
        [str(tmp_path / "meta2.json")], n_sample_frames=4, n_motion_frames=2,
        audio_margin=2,
    )
    assert len(ds) == 1
    item = ds[0]
    assert item["pixel_values"].shape == (4, 64, 64, 3)
    assert item["motion_pixels"].shape == (2, 64, 64, 3)
    assert item["audio_windows"].shape == (4, 5, 12, 768)
    assert item["face_emb"].shape == (512,)
