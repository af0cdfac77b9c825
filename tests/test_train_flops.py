"""Frozen-module backward DCE: XLA cost-analysis regression test.

The VAE (both stages) and image_proj/face_locator (stage 2) are frozen;
train/step.py stop_gradients their outputs so the compiler dead-codes
their backwards (reference parity: torch requires_grad=False means those
backwards never run, train_stage1.py/train_stage2.py freeze blocks).
Measured at tiny scale on CPU: 2.665e8 vs 5.441e8 flops — a 51% step
reduction. This test pins that the pruning keeps working.
"""

import contextlib
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _compiled_flops(step_patch) -> float:
    from hallo_tpu.train.state import (
        OptimizerConfig, TrainState, label_params, make_optimizer,
        stage2_trainable,
    )
    from hallo_tpu.train.step import TrainConfig, make_train_step
    from hallo_tpu.utils.factory import build_models

    h = w = 64
    f, m, b = 4, 2, 1
    models = build_models(
        "tiny", dtype=jnp.float32, init_key=jax.random.PRNGKey(0),
        height=h, width=w, clip_length=f, n_motion_frames=m,
    )
    labels = label_params(models.params, stage2_trainable)
    tx = make_optimizer(OptimizerConfig(), labels)
    state = TrainState.create(models.params, tx)
    ip = models.image_proj.config
    ap = models.audio_proj.config
    hl = h // 8
    rng = np.random.default_rng(0)
    batch = dict(
        pixel_values=rng.uniform(-1, 1, (b, f, h, w, 3)).astype(np.float32),
        ref_pixels=rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        motion_pixels=rng.uniform(-1, 1, (b, m, h, w, 3)).astype(np.float32),
        audio_windows=rng.normal(
            size=(b, f, ap.seq_len, ap.blocks, ap.channels)
        ).astype(np.float32),
        face_emb=rng.normal(size=(b, ip.clip_embeddings_dim)).astype(np.float32),
        face_region=np.ones((b, h, w, 3), np.float32),
        masks=tuple(
            tuple(np.ones((b, (hl // 2**d) ** 2), np.float32) for _ in range(3))
            for d in range(4)
        ),
    )
    batch = jax.tree.map(jnp.asarray, batch)
    with step_patch:
        step = make_train_step(models, tx, TrainConfig(stage=2))
        compiled = jax.jit(step).lower(state, batch, jax.random.PRNGKey(1)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", -1.0))


@pytest.mark.slow
def test_frozen_backward_dce_flops():
    pruned = _compiled_flops(contextlib.nullcontext())
    unpruned = _compiled_flops(
        mock.patch.object(jax.lax, "stop_gradient", lambda x: x)
    )
    assert pruned > 0 and unpruned > 0
    reduction = 1.0 - pruned / unpruned
    # measured 51% at this scale; keep headroom for compiler drift
    assert reduction > 0.30, (pruned, unpruned, reduction)
