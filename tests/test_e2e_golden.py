"""End-to-end quality anchor (BASELINE config 1 in spirit: fp32, CPU,
fixed seed, 2-step DDIM).

Pins the FULL pipeline output — stats and an 8x8x3 perceptual downsample —
against a checked-in golden so a silent numerics regression between rounds
(kernel rewrites, layout changes, scheduler edits) fails the suite even
when every shape/finiteness test still passes.

Regenerate CONSCIOUSLY after an intended numerics change:
    HALLO_REGEN_GOLDEN=1 python -m pytest tests/test_e2e_golden.py
"""

import os

import jax
import numpy as np
import pytest

from hallo_tpu.config import SchedulerConfig
from hallo_tpu.pipelines.face_animate import FaceAnimatePipeline

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "e2e_tiny.npz")


@pytest.mark.slow
def test_e2e_pipeline_matches_golden():
    from hallo_tpu.utils.factory import build_models

    h, f, m = 64, 4, 2
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=h,
        clip_length=f, n_motion_frames=m,
    )
    pipe = FaceAnimatePipeline(
        models,
        SchedulerConfig(),
        num_inference_steps=2,
        guidance_scale=3.5,
        clip_length=f,
        n_motion_frames=m,
    )
    rng = np.random.default_rng(7)
    ref = rng.uniform(-1, 1, size=(1, h, h, 3)).astype(np.float32)
    audio = rng.normal(size=(f, 3, 2, 4)).astype(np.float32)
    face_emb = rng.normal(size=(1, 16)).astype(np.float32)
    region = np.ones((1, h, h, 3), np.float32)
    hl = h // 8
    masks = tuple(
        tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
        for d in range(4)
    )
    video = pipe(ref, audio, face_emb, region, masks, seed=11)
    assert video.shape == (1, f, h, h, 3)

    # coarse perceptual signature: 8x8 spatial pooling of the first frame +
    # global stats of the whole clip
    frame = video[0, 0]
    pooled = frame.reshape(8, h // 8, 8, h // 8, 3).mean(axis=(1, 3))
    stats = np.array(
        [video.mean(), video.std(), video.min(), video.max()], np.float64
    )

    if os.environ.get("HALLO_REGEN_GOLDEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, pooled=pooled, stats=stats)
        pytest.skip(f"golden regenerated at {GOLDEN_PATH}")

    assert os.path.exists(GOLDEN_PATH), (
        "golden missing — run with HALLO_REGEN_GOLDEN=1 once and commit it"
    )
    golden = np.load(GOLDEN_PATH)
    np.testing.assert_allclose(stats, golden["stats"], atol=2e-3, rtol=0)
    np.testing.assert_allclose(pooled, golden["pooled"], atol=5e-3, rtol=0)
