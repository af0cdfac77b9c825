"""Nested per-layer remat (`unet_blocks.inner_remat`, UNetConfig.remat_inner).

Rematerialization must be semantics-preserving: the stage-2 training step
with remat + remat_inner must produce the same loss and the same updated
parameters (i.e. the same gradients) as the plain path. (The WHY of
remat_inner is memory: block-level remat alone measured 22.16 G HBM needed
for the full-width 512² step — the replay of a block holds all its
intra-layer temporaries at once; per-layer nesting bounds the live set to
one layer. See BASELINE.md r3.)
"""

import jax
import numpy as np
import pytest


def _one_step(remat: bool, remat_inner: bool):
    from hallo_tpu.train.state import (
        OptimizerConfig, TrainState, label_params, make_optimizer,
        stage2_trainable,
    )
    from hallo_tpu.train.step import TrainConfig, make_train_step
    from hallo_tpu.utils.factory import build_models

    h = w = 64
    f, m, b = 2, 2, 1
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=f, n_motion_frames=m,
        unet_overrides=dict(remat=remat, remat_inner=remat_inner),
    )
    labels = label_params(models.params, stage2_trainable)
    tx = make_optimizer(OptimizerConfig(), labels)
    state = TrainState.create(models.params, tx)
    step_fn = jax.jit(make_train_step(models, tx, TrainConfig(stage=2)))

    ap = models.audio_proj.config
    ip = models.image_proj.config
    hl = h // 8
    rng = np.random.default_rng(3)
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
        timesteps=np.full((b,), 321, np.int32),
    )
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(7))
    return float(metrics["loss"]), new_state.params


@pytest.mark.slow
def test_remat_inner_matches_plain():
    loss0, p0 = _one_step(remat=False, remat_inner=False)
    loss1, p1 = _one_step(remat=True, remat_inner=True)
    assert np.isfinite(loss0)
    np.testing.assert_allclose(loss1, loss0, rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(p0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(p1))
    assert len(flat0) == len(flat1)
    for path, a in flat0:
        np.testing.assert_allclose(
            np.asarray(flat1[path]), np.asarray(a), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_feedforward_chunks_match_unchunked():
    """FeedForward.chunks is a memory knob, not a math change: same params
    (identical paths), same outputs, same grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hallo_tpu.models.layers import FeedForward

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 8, 16)).astype(np.float32)
    )
    plain = FeedForward(16, dtype=jnp.float32)
    chunked = FeedForward(16, dtype=jnp.float32, chunks=4)
    params = plain.init(jax.random.PRNGKey(0), x)
    # identical param paths -> the same tree initializes both
    y0 = plain.apply(params, x)
    y1 = chunked.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def loss(fn):
        return lambda p: jnp.sum(fn.apply(p, x) ** 2)

    g0 = jax.grad(loss(plain))(params)
    g1 = jax.grad(loss(chunked))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        g0, g1,
    )
    # non-divisible token axis falls back to the unchunked path
    x2 = x[:, :, :7]
    y2 = FeedForward(16, dtype=jnp.float32, chunks=4).apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(plain.apply(params, x2)), atol=1e-6
    )
