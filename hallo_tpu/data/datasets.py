"""Training datasets.

Reference: hallo/datasets/talk_video.py:83-316 (stage 2) and
mask_image.py:21-154 (stage 1). This implementation reads preprocessed
.npz clips (written by scripts/data_preprocess.py) instead of decoding video
per item (no decord in this environment; preprocessing decodes once), and
yields numpy batches shaped for hallo_tpu.train.step:

stage 1: pixel_values (B,1,H,W,3), ref_pixels, face_emb, face_region
stage 2: + motion_pixels (B,M,H,W,3), audio_windows (B,F,W5,12,768),
         masks (4 x (full/face/lip) each (B, L_d))
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, Iterator, List, Optional

import numpy as np


class FaceMaskDataset:
    """Stage-1 items: (ref frame, target frame >= sample_margin apart,
    face mask, face embedding) — mask_image.py:21-154."""

    def __init__(
        self,
        meta_paths: List[str],
        img_size: int = 512,
        sample_margin: int = 30,
        seed: int = 0,
    ):
        self.meta: List[dict] = []
        for path in meta_paths:
            with open(path) as f:
                self.meta.extend(json.load(f))
        self.img_size = img_size
        self.sample_margin = sample_margin
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.meta)

    def clip_path(self, idx: int) -> str:
        return self.meta[idx]["clip_path"]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.assemble(idx, np.load(self.clip_path(idx)))

    def assemble(self, idx: int, clip) -> Dict[str, np.ndarray]:
        """Build the item from preloaded npz contents (the prefetch path
        feeds clips decoded off-thread by the native FilePrefetcher)."""
        frames = clip["frames"]  # (T, H, W, 3) uint8
        t = len(frames)
        ref_idx = self.rng.randrange(t)
        margin = min(self.sample_margin, t - 1)
        # target at least `margin` away, wrapped (mask_image.py:103-112)
        if ref_idx + margin < t:
            tgt_idx = self.rng.randrange(ref_idx + margin, t)
        elif ref_idx - margin > 0:
            tgt_idx = self.rng.randrange(0, ref_idx - margin)
        else:
            tgt_idx = self.rng.randrange(t)

        to_pm1 = lambda x: x.astype(np.float32) / 255.0 * 2.0 - 1.0
        return dict(
            pixel_values=to_pm1(frames[tgt_idx])[None],  # (1, H, W, 3)
            ref_pixels=to_pm1(frames[ref_idx]),
            face_emb=clip["face_emb"].astype(np.float32),
            face_region=clip["face_region"].astype(np.float32),
        )


class TalkingVideoDataset:
    """Stage-2 items: random 16-frame window + motion frames + audio windows
    + mask pyramids — talk_video.py:83-316."""

    def __init__(
        self,
        meta_paths: List[str],
        n_sample_frames: int = 14,
        n_motion_frames: int = 2,
        audio_margin: int = 2,
        seed: int = 0,
    ):
        self.meta: List[dict] = []
        for path in meta_paths:
            with open(path) as f:
                self.meta.extend(json.load(f))
        self.n_sample_frames = n_sample_frames
        self.n_motion_frames = n_motion_frames
        self.audio_margin = audio_margin
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.meta)

    def clip_path(self, idx: int) -> str:
        return self.meta[idx]["clip_path"]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.assemble(idx, np.load(self.clip_path(idx)))

    def assemble(self, idx: int, clip) -> Dict[str, np.ndarray]:
        """Build the item from preloaded npz contents (prefetch path)."""
        frames = clip["frames"]  # (T, H, W, 3) uint8
        audio = clip["audio_emb"]  # (T, 12, 768)
        t = min(len(frames), len(audio))
        f, m, margin = self.n_sample_frames, self.n_motion_frames, self.audio_margin

        lo = m + margin
        hi = t - f - margin
        start = self.rng.randrange(lo, max(hi, lo + 1))
        end = min(start + f, t - margin)
        idxs = np.arange(start, end)
        if len(idxs) < f:  # pad by repeating the last frame
            idxs = np.concatenate([idxs, np.repeat(idxs[-1:], f - len(idxs))])

        to_pm1 = lambda x: x.astype(np.float32) / 255.0 * 2.0 - 1.0
        # audio windows: center +-margin gather (talk_video.py:243-250)
        centers = idxs[:, None] + np.arange(-margin, margin + 1)[None, :]
        centers = np.clip(centers, 0, t - 1)
        audio_windows = audio[centers]  # (F, 2m+1, 12, 768)

        ref_idx = self.rng.randrange(t)
        motion = frames[max(start - m, 0) : start]
        if len(motion) < m:
            motion = np.concatenate(
                [np.repeat(frames[:1], m - len(motion), axis=0), motion], axis=0
            )

        masks = []
        for level in range(4):
            masks.append(
                tuple(
                    clip[f"{kind}_mask_{level}"].reshape(-1).astype(np.float32)
                    for kind in ("full", "face", "lip")
                )
            )
        return dict(
            pixel_values=to_pm1(frames[idxs]),
            ref_pixels=to_pm1(frames[ref_idx]),
            motion_pixels=to_pm1(motion),
            audio_windows=audio_windows.astype(np.float32),
            face_emb=clip["face_emb"].astype(np.float32),
            face_region=clip["face_region"].astype(np.float32),
            masks=tuple(masks),
        )


def batch_iterator(
    dataset,
    batch_size: int,
    seed: int = 0,
    drop_last: bool = True,
    prefetch: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffling batch loader (replaces torch DataLoader + DDP sampler;
    under pjit the global batch is sharded on the data axis).

    With `prefetch`, clip npz files are read ahead by the native C++
    FilePrefetcher (data/native_prefetch.py) in epoch order so disk IO
    overlaps the train step; falls back to synchronous reads when the
    native library is unavailable or the dataset has no clip files."""
    if len(dataset) == 0:
        raise ValueError("batch_iterator: empty dataset")
    rng = np.random.default_rng(seed)
    use_prefetch = prefetch and hasattr(dataset, "clip_path")

    def epoch_order():
        order = rng.permutation(len(dataset))
        if batch_size > len(order):
            # dataset smaller than the global batch (tiny integration runs,
            # device-count > clip-count): sample with replacement so at
            # least one batch is always produced per epoch instead of
            # spinning forever in an empty range.
            reps = -(-batch_size // len(order))
            order = np.concatenate(
                [order] + [rng.permutation(len(dataset)) for _ in range(reps - 1)]
            )
        return order[: len(order) - len(order) % batch_size]

    def epoch_items(order) -> Iterator[Dict[str, np.ndarray]]:
        if not use_prefetch:
            for j in order:
                yield dataset[int(j)]
            return
        from hallo_tpu.data.native_prefetch import FilePrefetcher

        pf = FilePrefetcher([dataset.clip_path(int(j)) for j in order])
        try:
            for j, clip in zip(order, pf.iter_npz()):
                yield dataset.assemble(int(j), clip)
        finally:
            pf.close()

    def collate(items):
        batch = {}
        for key in items[0]:
            if key == "masks":
                batch[key] = tuple(
                    tuple(
                        np.stack([it[key][lvl][kind] for it in items])
                        for kind in range(3)
                    )
                    for lvl in range(4)
                )
            else:
                batch[key] = np.stack([it[key] for it in items])
        return batch

    while True:
        items = []
        for item in epoch_items(epoch_order()):
            items.append(item)
            if len(items) == batch_size:
                yield collate(items)
                items = []
