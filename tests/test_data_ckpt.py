"""Datasets (npz clips), batch iterator, and orbax checkpoint rotation."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hallo_tpu.data.datasets import (
    FaceMaskDataset,
    TalkingVideoDataset,
    batch_iterator,
)
from hallo_tpu.train.state import TrainState
from hallo_tpu.utils import checkpoint as ckpt


def _write_clip(tmp_path, name="clip0", t=24, h=32):
    rng = np.random.default_rng(0)
    data = dict(
        frames=(rng.uniform(0, 255, (t, h, h, 3))).astype(np.uint8),
        audio_emb=rng.normal(size=(t, 2, 4)).astype(np.float32),
        face_emb=rng.normal(size=(16,)).astype(np.float32),
        face_region=np.ones((h, h, 3), np.float32),
    )
    for level, scale in enumerate((8, 16, 32, 64)):
        size = max(h // scale, 1)
        for kind in ("full", "face", "lip"):
            data[f"{kind}_mask_{level}"] = np.ones((1, size * size), np.float32)
    path = tmp_path / f"{name}.npz"
    np.savez(path, **data)
    meta = tmp_path / f"{name}_meta.json"
    meta.write_text(json.dumps([{"clip_path": str(path)}]))
    return str(meta)


def test_talking_video_dataset_shapes(tmp_path):
    meta = _write_clip(tmp_path)
    ds = TalkingVideoDataset([meta], n_sample_frames=8, n_motion_frames=2,
                             audio_margin=2)
    item = ds[0]
    assert item["pixel_values"].shape == (8, 32, 32, 3)
    assert item["motion_pixels"].shape == (2, 32, 32, 3)
    assert item["audio_windows"].shape == (8, 5, 2, 4)
    assert item["pixel_values"].min() >= -1 and item["pixel_values"].max() <= 1
    assert len(item["masks"]) == 4 and len(item["masks"][0]) == 3


def test_face_mask_dataset_and_batching(tmp_path):
    meta = _write_clip(tmp_path, "clip1")
    ds = FaceMaskDataset([meta], sample_margin=5)
    item = ds[0]
    assert item["pixel_values"].shape == (1, 32, 32, 3)
    it = batch_iterator(ds, batch_size=1)
    batch = next(it)
    assert batch["pixel_values"].shape == (1, 1, 32, 32, 3)
    assert batch["face_emb"].shape == (1, 16)


def test_stage2_batching_masks(tmp_path):
    meta = _write_clip(tmp_path, "clip2")
    ds = TalkingVideoDataset([meta], n_sample_frames=4, n_motion_frames=2)
    batch = next(batch_iterator(ds, batch_size=1))
    assert batch["masks"][0][0].shape == (1, 16)  # level0 full mask, 4x4
    assert batch["audio_windows"].shape == (1, 4, 5, 2, 4)


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)

    root = str(tmp_path / "ckpts")
    os.makedirs(root)
    for step in (100, 200, 300, 400):
        state = TrainState(
            step=jnp.asarray(step), params=state.params, opt_state=state.opt_state
        )
        ckpt.save_train_state(root, step, state, keep=2)

    assert ckpt.latest_step(root) == 400
    kept = sorted(os.listdir(root))
    assert kept == ["checkpoint-300", "checkpoint-400"]

    restored, step = ckpt.load_train_state(root, state)
    assert step == 400
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    assert int(restored.step) == 400


def test_params_export_import(tmp_path):
    tree = {"a": jnp.ones((4, 4)), "nested": {"b": jnp.zeros(7)}}
    path = str(tmp_path / "mod")
    ckpt.save_params(path, tree)
    restored = ckpt.load_params(path, jax.tree.map(jnp.zeros_like, tree))
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.ones((4, 4)))


def test_write_video_grid(tmp_path):
    from hallo_tpu.utils.video import read_frames, write_video_grid

    rng = np.random.default_rng(0)
    videos = rng.uniform(0, 1, (3, 4, 32, 32, 3)).astype(np.float32)
    path = str(tmp_path / "grid.mp4")
    write_video_grid(videos, path, fps=5, n_rows=2)
    frames = read_frames(path)
    assert len(frames) == 4
    assert frames[0].shape == (64, 64, 3)  # 2x2 tile grid (one pad slot)
