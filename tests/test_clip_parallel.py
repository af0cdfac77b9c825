"""Clip parallelism (sequence-parallel over frames) numerics.

The denoiser shards the 16-frame clip across a ("seq",) mesh axis: every op
except the temporal motion modules is frame-local; motion modules all_to_all
frames<->sites (Ulysses-style) and inflated GroupNorms psum their moments.
These tests run the sharded path on the CPU test mesh and require it to match
the unsharded oracle to fp32 tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hallo_tpu.config import MotionModuleConfig
from hallo_tpu.models.motion import MotionModule
from hallo_tpu.utils.factory import build_models

N_SEQ = 4


def _mesh() -> Mesh:
    devs = jax.devices()
    if len(devs) < N_SEQ:
        pytest.skip(f"needs {N_SEQ} devices")
    return Mesh(np.asarray(devs[:N_SEQ]), ("seq",))


def test_motion_module_matches_unsharded():
    b, f, h, w, c = 2, 8, 2, 4, 8
    m = 2
    cfg = MotionModuleConfig(
        num_attention_heads=2, temporal_position_encoding_max_len=16,
        norm_num_groups=4,
    )
    mod = MotionModule(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, f, h, w, c)), jnp.float32)
    mf = jnp.asarray(rng.standard_normal((b, m, h * w, c)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, mf)

    want = mod.apply(params, x, mf)

    mesh = _mesh()
    fn = shard_map(
        lambda p_, x_, mf_: mod.apply(p_, x_, mf_, seq_axis="seq"),
        mesh=mesh,
        in_specs=(P(), P(None, "seq"), P()),
        out_specs=P(None, "seq"),
    )
    got = jax.jit(fn)(params, x, mf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_motion_module_no_motion_frames_matches():
    b, f, h, w, c = 1, 8, 4, 4, 8
    cfg = MotionModuleConfig(
        num_attention_heads=2, temporal_position_encoding_max_len=16,
        norm_num_groups=4,
    )
    mod = MotionModule(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, f, h, w, c)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)
    mesh = _mesh()
    fn = shard_map(
        lambda p_, x_: mod.apply(p_, x_, None, seq_axis="seq"),
        mesh=mesh,
        in_specs=(P(), P(None, "seq")),
        out_specs=P(None, "seq"),
    )
    got = jax.jit(fn)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_denoiser_clip_parallel_matches_unsharded():
    h_img = w_img = 128  # latents 16x16 -> deepest mask level 2x2 (divisible)
    f, m, b = 8, 2, 2
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h_img, width=w_img,
        clip_length=f, n_motion_frames=m,
        unet_overrides=dict(
            motion_module=MotionModuleConfig(
                num_attention_heads=2,
                temporal_position_encoding_max_len=16,
                norm_num_groups=4,
            )
        ),
    )
    den = models.denoising_net
    p = models.params["denoising_net"]
    ip = models.image_proj.config
    ap = models.audio_proj.config
    cfgd = den.config
    hl = wl = h_img // 8

    rng = np.random.default_rng(2)
    sample = jnp.asarray(rng.standard_normal((b, f, hl, wl, 4)), jnp.float32)
    t = jnp.asarray(400.0)
    context = jnp.asarray(
        rng.standard_normal((b, ip.clip_extra_context_tokens, cfgd.cross_attention_dim)),
        jnp.float32,
    )
    feat_shapes = jax.eval_shape(
        lambda pr: models.reference_net.apply(
            pr, jnp.zeros((b * (1 + m), hl, wl, 4)), jnp.zeros(()),
            jnp.zeros((b * (1 + m), ip.clip_extra_context_tokens,
                       cfgd.cross_attention_dim)),
        )[1],
        models.params["reference_net"],
    )
    ref_feats = jax.tree.map(
        lambda s: jnp.asarray(rng.standard_normal((b,) + s.shape[1:]), jnp.float32),
        feat_shapes,
    )
    motion_feats = jax.tree.map(
        lambda s: jnp.asarray(
            rng.standard_normal((b, m) + s.shape[1:]), jnp.float32
        ),
        feat_shapes,
    )
    audio = jnp.asarray(
        rng.standard_normal((b, f, ap.context_tokens, cfgd.audio_attention_dim)),
        jnp.float32,
    )
    face_cond = jnp.asarray(
        rng.standard_normal((b, f, hl, wl, cfgd.block_out_channels[0])) * 0.1,
        jnp.float32,
    )
    masks_bfl = tuple(
        tuple(
            jnp.asarray(
                rng.uniform(0, 1, (b, f, (hl // 2**d) * (wl // 2**d))), jnp.float32
            )
            for _ in range(3)
        )
        for d in range(4)
    )
    motion_scale = jnp.ones(3)
    uncond_mask = jnp.asarray([1.0, 0.0])

    def flat_masks(mk):
        return jax.tree.map(lambda x: x.reshape(-1, x.shape[-1]), mk)

    want = den.apply(
        p, sample, t, context, ref_feats, motion_feats, audio, face_cond,
        flat_masks(masks_bfl), motion_scale, uncond_mask,
    )

    mesh = _mesh()

    def body(p_, sample_, context_, ref_, mot_, audio_, face_, masks_, ms_, um_):
        return den.apply(
            p_, sample_, t, context_, ref_, mot_, audio_, face_,
            flat_masks(masks_), ms_, um_, seq_axis="seq",
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(None, "seq"), P(), P(), P(), P(None, "seq"),
            P(None, "seq"), P(None, "seq"), P(), P(),
        ),
        out_specs=P(None, "seq"),
    )
    got = jax.jit(fn)(
        p, sample, context, ref_feats, motion_feats, audio, face_cond,
        masks_bfl, motion_scale, uncond_mask,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5)


@pytest.mark.slow
def test_train_step_seq_parallel_matches_dp():
    """Stage-2 train step under the ("data","seq") shard_map path must give
    the same loss and gradients as the unsharded oracle when noise and
    timesteps are overridden deterministically."""
    import optax

    from hallo_tpu.parallel.mesh import make_mesh
    from hallo_tpu.train.state import (
        OptimizerConfig, TrainState, label_params, make_optimizer,
        stage2_trainable,
    )
    from hallo_tpu.train.step import TrainConfig, make_train_step

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")

    h = w = 128  # deepest mask level must split over the seq shards
    f, m = 2, 2
    b = 2
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=f, n_motion_frames=m,
    )
    labels = label_params(models.params, stage2_trainable)
    tx = make_optimizer(OptimizerConfig(), labels)
    state = TrainState.create(models.params, tx)
    tc = TrainConfig(stage=2, noise_offset=0.0)

    rng = np.random.default_rng(5)
    hl = h // 8
    ap = models.audio_proj.config
    ip = models.image_proj.config
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
        noise=rng.standard_normal((b, f, hl, hl, 4)).astype(np.float32),
        timesteps=np.asarray([300, 700], np.int64),
    )
    key = jax.random.PRNGKey(3)

    oracle_step = make_train_step(models, tx, tc)
    want_state, want_metrics = jax.jit(oracle_step)(state, batch, key)

    mesh = make_mesh(n_data=2, n_seq=2)
    sp_step = make_train_step(models, tx, tc, mesh=mesh)
    with mesh:
        got_state, got_metrics = jax.jit(sp_step)(state, batch, key)

    np.testing.assert_allclose(
        float(got_metrics["loss"]), float(want_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(got_metrics["grad_norm"]), float(want_metrics["grad_norm"]),
        rtol=1e-3,  # fp32 reduction-order noise across the sharded backward
    )
    # updated params match on a trainable (motion/audio) leaf
    flat_w = jax.tree.leaves(want_state.params["denoising_net"])
    flat_g = jax.tree.leaves(got_state.params["denoising_net"])
    for a, bb in zip(flat_g[:20], flat_w[:20]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=1e-5, rtol=1e-4
        )


@pytest.mark.slow
def test_pipeline_clip_parallel_matches():
    """FaceAnimatePipeline(mesh=...) — the full jitted clip program with the
    denoise step shard_mapped over frames — must reproduce the single-device
    pipeline's frames (uint8, so exact equality up to rounding of fp noise:
    allow off-by-one levels on a tiny fraction of pixels)."""
    from jax.sharding import Mesh

    from hallo_tpu.pipelines.face_animate import FaceAnimatePipeline

    if len(jax.devices()) < N_SEQ:
        pytest.skip("needs devices")

    h = w = 128
    f, m = 8, 2
    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=f, n_motion_frames=m,
        unet_overrides=dict(
            motion_module=MotionModuleConfig(
                num_attention_heads=2,
                temporal_position_encoding_max_len=16,
                norm_num_groups=4,
            )
        ),
    )
    rng = np.random.default_rng(7)
    ref_img = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    ap = models.audio_proj.config
    audio = rng.normal(size=(f, ap.seq_len, ap.blocks, ap.channels)).astype(
        np.float32
    )
    face_emb = rng.normal(
        size=(1, models.image_proj.config.clip_embeddings_dim)
    ).astype(np.float32)
    face_region = np.ones((1, h, w, 3), np.float32)
    hl = h // 8
    masks = tuple(
        tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
        for d in range(4)
    )

    kwargs = dict(
        num_inference_steps=2, clip_length=f, n_motion_frames=m,
    )
    want = FaceAnimatePipeline(models, **kwargs)(
        ref_img, audio, face_emb, face_region, masks, seed=11
    )
    mesh = Mesh(np.asarray(jax.devices()[:N_SEQ]), ("seq",))
    got = FaceAnimatePipeline(models, mesh=mesh, **kwargs)(
        ref_img, audio, face_emb, face_region, masks, seed=11
    )
    assert got.shape == want.shape
    # float frames in [0,1] quantized from uint8; fp reduction-order noise
    # may flip an occasional rounding decision
    diff = np.abs(got - want)
    assert np.mean(diff > 1.5 / 255.0) < 1e-3, np.mean(diff > 1.5 / 255.0)
    assert np.max(diff) <= 16.5 / 255.0, np.max(diff)
