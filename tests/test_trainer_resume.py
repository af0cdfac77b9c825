"""Kill-and-resume exactness (VERDICT r5 item 8).

The reference's recovery story is `resume_from_checkpoint: "latest"` +
accelerate load_state (util.py:784-819). Here we prove the TPU equivalent
end-to-end at the step level:

  1. orbax round-trip restores EVERY leaf of the train state bit-exactly —
     params, Adam moments (incl. the int8 block-quantized 8-bit-Adam
     leaves), and the step counter;
  2. a training step taken from the restored state with the same batch and
     per-step rng reproduces the uninterrupted run's state exactly
     (the scripts derive per-step keys via fold_in(rng, step), so a
     resumed process replays the same key at each step).

Plus the nan-guard: a poisoned batch must leave params/opt-state untouched
and set metrics["skipped"] (the reference has no such guard).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hallo_tpu.train.state import (
    OptimizerConfig,
    TrainState,
    label_params,
    make_optimizer,
    stage2_trainable,
)
from hallo_tpu.train.step import TrainConfig, make_train_step
from hallo_tpu.utils import checkpoint as ckpt
from hallo_tpu.utils.factory import build_models


@pytest.fixture(scope="module")
def setup():
    h = w = 64
    f, m = 2, 2
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=f, n_motion_frames=m,
    )
    labels = label_params(models.params, stage2_trainable)
    # 8-bit Adam ON: the int8 moment blocks are the leaves most likely to
    # be mangled by a save/restore path
    tx = make_optimizer(OptimizerConfig(use_8bit_adam=True), labels)
    step_fn = jax.jit(make_train_step(models, tx, TrainConfig(stage=2)))

    rng = np.random.default_rng(0)
    ip = models.image_proj.config
    ap = models.audio_proj.config
    hl = h // 8
    b = 2
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
    return models, tx, step_fn, batch


def _assert_trees_equal(a, b, what):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb), what
    for x, y in zip(la, lb):
        assert np.array_equal(np.asarray(x), np.asarray(y)), (
            f"{what}: leaf mismatch {np.asarray(x).dtype} {np.asarray(x).shape}"
        )


@pytest.mark.slow
def test_kill_and_resume_exact(setup, tmp_path):
    models, tx, step_fn, batch = setup
    root = str(tmp_path)
    key = jax.random.PRNGKey(7)

    # uninterrupted run: 3 steps, checkpoint after step 2
    state = TrainState.create(models.params, tx)
    for step in range(2):
        state, _ = step_fn(state, batch, jax.random.fold_in(key, step))
    ckpt.save_train_state(root, 2, state, keep=3)
    saved = jax.tree.map(np.asarray, state)
    state3, _ = step_fn(state, batch, jax.random.fold_in(key, 2))

    # "kill": fresh random state, then restore latest
    fresh = TrainState.create(
        jax.tree.map(lambda x: jnp.zeros_like(x), models.params), tx
    )
    restored, start_step = ckpt.load_train_state(root, fresh)
    assert start_step == 2
    _assert_trees_equal(restored.params, saved.params, "params")
    _assert_trees_equal(restored.opt_state, saved.opt_state, "opt_state")
    assert int(restored.step) == int(saved.step)

    # continue: the resumed step 2 must equal the uninterrupted one exactly
    resumed3, _ = step_fn(restored, batch, jax.random.fold_in(key, 2))
    _assert_trees_equal(resumed3.params, state3.params, "post-resume params")
    _assert_trees_equal(
        resumed3.opt_state, state3.opt_state, "post-resume opt_state"
    )


@pytest.mark.slow
def test_nan_guard_skips_update(setup):
    models, tx, step_fn, batch = setup
    state = TrainState.create(models.params, tx)
    state, m0 = step_fn(state, batch, jax.random.PRNGKey(1))
    assert float(m0["skipped"]) == 0.0

    poisoned = dict(batch)
    poisoned["pixel_values"] = np.full_like(batch["pixel_values"], np.nan)
    new_state, m1 = step_fn(state, poisoned, jax.random.PRNGKey(2))
    assert float(m1["skipped"]) == 1.0
    assert not np.isfinite(float(m1["loss"]))
    _assert_trees_equal(new_state.params, state.params, "nan-guard params")
    _assert_trees_equal(
        new_state.opt_state, state.opt_state, "nan-guard opt_state"
    )
    # step counter still advances (counts attempts, like the loop index)
    assert int(new_state.step) == int(state.step) + 1

    # and a subsequent clean step proceeds normally
    ok_state, m2 = step_fn(new_state, batch, jax.random.PRNGKey(3))
    assert float(m2["skipped"]) == 0.0
    assert np.isfinite(float(m2["loss"]))
