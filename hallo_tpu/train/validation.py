"""Training-time validation renders — the reference's de-facto functional
test (SURVEY.md §4: log_validation, train_stage1.py:181-286 renders images
via StaticPipeline; train_stage2.py:250-418 renders videos via
FaceAnimatePipeline)."""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def log_validation_stage1(
    models,
    save_dir: str,
    global_step: int,
    ref_images: Sequence[np.ndarray],
    face_embs: Sequence[np.ndarray],
    face_regions: Sequence[np.ndarray],
    num_inference_steps: int = 20,
    seed: int = 42,
) -> None:
    """Render identity-transfer stills and save PNGs for eyeballing."""
    import cv2

    from hallo_tpu.config import SchedulerConfig
    from hallo_tpu.pipelines.static import StaticPipeline

    pipe = StaticPipeline(models, SchedulerConfig(), num_inference_steps)
    out_dir = os.path.join(save_dir, "validation")
    os.makedirs(out_dir, exist_ok=True)
    for i, (img, emb, region) in enumerate(zip(ref_images, face_embs, face_regions)):
        sample = pipe(img[None], emb[None], region[None], seed=seed)
        path = os.path.join(out_dir, f"step{global_step}_sample{i}.png")
        cv2.imwrite(path, cv2.cvtColor(
            (sample[0] * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
        logger.info("validation still -> %s", path)


def log_validation_stage2(
    models,
    save_dir: str,
    global_step: int,
    ref_image: np.ndarray,
    audio_windows: np.ndarray,
    face_emb: np.ndarray,
    face_region: np.ndarray,
    masks,
    clip_length: int = 16,
    num_inference_steps: int = 40,
    fps: int = 25,
    seed: int = 42,
) -> None:
    """Render a full validation video."""
    from hallo_tpu.config import SchedulerConfig
    from hallo_tpu.pipelines.face_animate import FaceAnimatePipeline
    from hallo_tpu.utils.video import write_video

    pipe = FaceAnimatePipeline(
        models, SchedulerConfig(), num_inference_steps, clip_length=clip_length
    )
    video = pipe(
        ref_image[None], audio_windows, face_emb[None], face_region[None], masks,
        seed=seed,
    )
    out_dir = os.path.join(save_dir, "validation")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"step{global_step}.mp4")
    write_video(video[0], path, fps=fps)
    logger.info("validation video -> %s", path)
