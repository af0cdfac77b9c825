"""Wiring smoke tests on a tiny UNet configuration: shapes, zero-init
identities (motion module / face locator / audio zero-convs), and the
ref-feature pytree contract between ReferenceNet and DenoisingUNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hallo_tpu.config import (
    FaceLocatorConfig,
    MotionModuleConfig,
    UNetConfig,
    denoising_unet_config,
    reference_unet_config,
)
from hallo_tpu.models.face_locator import FaceLocator
from hallo_tpu.models.motion import MotionModule
from hallo_tpu.models.projections import AudioProj, ImageProj
from hallo_tpu.models.unet_denoise import DenoisingUNet
from hallo_tpu.models.unet_ref import ReferenceNet
from hallo_tpu.config import AudioProjConfig, ImageProjConfig

TINY = dict(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    num_attention_heads=2,
    cross_attention_dim=12,
    norm_num_groups=4,
    audio_attention_dim=6,
    motion_module=MotionModuleConfig(
        num_attention_heads=2,
        num_transformer_block=1,
        temporal_position_encoding_max_len=8,
        norm_num_groups=4,
    ),
)


@pytest.fixture(scope="module")
def tiny_ref():
    cfg = reference_unet_config(**TINY)
    model = ReferenceNet(cfg)
    b, hw = 2, 16
    sample = jnp.zeros((b, hw, hw, 4))
    ctx = jnp.zeros((b, 4, cfg.cross_attention_dim))
    # jit the init: eager dispatch is ~0.4s/op on this 1-core host.
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, jnp.zeros(()), ctx)
    return cfg, model, params


@pytest.fixture(scope="module")
def tiny_denoise():
    cfg = denoising_unet_config(**TINY)
    model = DenoisingUNet(cfg)
    return cfg, model


def test_reference_net_features(tiny_ref):
    cfg, model, params = tiny_ref
    b, hw = 2, 16
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(b, hw, hw, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, 4, cfg.cross_attention_dim)).astype(np.float32))
    out, feats = jax.jit(model.apply)(params, sample, jnp.zeros(()), ctx)
    assert out.shape == (b, hw, hw, 4)
    assert set(feats.keys()) == {"down_0", "down_1", "down_2", "mid", "up_1", "up_2", "up_3"}
    # layers_per_block=1 -> one feature per down site, 2 per up site
    assert len(feats["down_0"]) == 1 and len(feats["up_1"]) == 2
    assert feats["down_0"][0].shape == (b, hw * hw, 8)
    assert feats["mid"][0].shape == (b, (hw // 8) ** 2, 16)


def test_denoising_unet_end_to_end(tiny_ref, tiny_denoise):
    ref_cfg, ref_model, ref_params = tiny_ref
    cfg, model = tiny_denoise
    b, f, hw = 2, 4, 16
    n_motion = 2
    rng = np.random.default_rng(1)

    # ReferenceNet pass over ref + motion frames
    ref_lat = jnp.asarray(
        rng.normal(size=(b * (1 + n_motion), hw, hw, 4)).astype(np.float32)
    )
    ctx = jnp.asarray(rng.normal(size=(b, 4, cfg.cross_attention_dim)).astype(np.float32))
    ctx_tiled = jnp.repeat(ctx, 1 + n_motion, axis=0)
    _, feats = jax.jit(ref_model.apply)(ref_params, ref_lat, jnp.zeros(()), ctx_tiled)

    split = jax.tree.map(
        lambda x: x.reshape(b, 1 + n_motion, *x.shape[1:]), feats
    )
    ref_feats = jax.tree.map(lambda x: x[:, 0], split)
    motion_feats = jax.tree.map(lambda x: x[:, 1:], split)

    sample = jnp.asarray(rng.normal(size=(b, f, hw, hw, 4)).astype(np.float32))
    audio = jnp.asarray(
        rng.normal(size=(b, f, 3, cfg.audio_attention_dim)).astype(np.float32)
    )
    masks = tuple(
        tuple(
            jnp.asarray(
                rng.uniform(size=(b * f, (hw // (2**d)) ** 2)).astype(np.float32)
            )
            for _ in range(3)
        )
        for d in range(4)
    )
    uncond = jnp.asarray([1.0, 0.0])

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        sample,
        jnp.zeros(()),
        ctx,
        ref_feats,
        motion_feats,
        audio,
        None,
        masks,
        jnp.ones(3),
        uncond,
    )
    out = jax.jit(model.apply)(
        params,
        sample,
        jnp.zeros(()),
        ctx,
        ref_feats,
        motion_feats,
        audio,
        None,
        masks,
        jnp.ones(3),
        uncond,
    )
    assert out.shape == sample.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_split_matches_masked_path(tiny_ref, tiny_denoise):
    # The static CFG-split fast path must equal the bias-masked formulation.
    ref_cfg, ref_model, ref_params = tiny_ref
    cfg, model = tiny_denoise
    b, f, hw, n_motion = 2, 2, 16, 2
    rng = np.random.default_rng(7)

    ref_lat = jnp.asarray(
        rng.normal(size=(b * (1 + n_motion), hw, hw, 4)).astype(np.float32)
    )
    ctx = jnp.asarray(rng.normal(size=(b, 4, cfg.cross_attention_dim)).astype(np.float32))
    _, feats = jax.jit(ref_model.apply)(
        ref_params, ref_lat, jnp.zeros(()), jnp.repeat(ctx, 1 + n_motion, axis=0)
    )
    split = jax.tree.map(lambda x: x.reshape(b, 1 + n_motion, *x.shape[1:]), feats)
    ref_feats = jax.tree.map(lambda x: x[:, 0], split)
    motion_feats = jax.tree.map(lambda x: x[:, 1:], split)

    sample = jnp.asarray(rng.normal(size=(b, f, hw, hw, 4)).astype(np.float32))
    # CFG batch contract (face_animate.py:377-378): the uncond half's audio
    # tokens are zeros — cfg_split relies on it to skip the uncond audio
    # branches (only the trained zero-conv biases survive).
    audio_cond = rng.normal(size=(b // 2, f, 3, cfg.audio_attention_dim))
    audio = jnp.asarray(
        np.concatenate([np.zeros_like(audio_cond), audio_cond]).astype(np.float32)
    )
    # Non-trivial 0/1 masks: the uncond fast path must reproduce the
    # mask-gated to_out-bias term zero_conv(mask * bo), not just the
    # zero-conv bias.
    masks = tuple(
        tuple(
            jnp.asarray(
                (rng.uniform(size=(b * f, (hw // 2**d) ** 2)) > 0.4).astype(
                    np.float32
                )
            )
            for _ in range(3)
        )
        for d in range(4)
    )
    args = (sample, jnp.asarray(300), ctx, ref_feats, motion_feats, audio, None,
            masks, jnp.ones(3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), *args, jnp.asarray([1.0, 0.0])
    )
    # Give the zero-init audio convs AND every attention to_out bias
    # non-zero values (as after training) so the uncond bias-restoring path
    # is actually exercised: with zero to_out biases the uncond audio
    # branches are exactly zero and a dropped bias term would go unseen.
    def _perturb(path, x):
        keys = [str(k) for k in path]
        if any("zero_conv" in k for k in keys):
            return x + 0.01 * np.arange(x.size, dtype=np.float32).reshape(x.shape)
        if any("to_out" in k for k in keys) and x.ndim == 1:
            return x + 0.02 * (1 + np.arange(x.size, dtype=np.float32) % 5)
        return x

    params = jax.tree_util.tree_map_with_path(_perturb, params)
    masked = jax.jit(lambda p: model.apply(p, *args, jnp.asarray([1.0, 0.0])))(params)
    split_out = jax.jit(lambda p: model.apply(p, *args, None, cfg_split=True))(params)
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(split_out), atol=2e-5
    )


def test_motion_module_is_identity_at_init():
    cfg = MotionModuleConfig(
        num_attention_heads=2, temporal_position_encoding_max_len=8, norm_num_groups=4
    )
    mm = MotionModule(cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 4, 4, 8)).astype(np.float32))
    params = jax.jit(mm.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(mm.apply)(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_face_locator_zero_at_init():
    fl = FaceLocator(FaceLocatorConfig(conditioning_embedding_channels=8))
    x = jnp.ones((1, 2, 32, 32, 3))
    params = jax.jit(fl.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(fl.apply)(params, x)
    assert out.shape == (1, 2, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_projections_shapes():
    ip = ImageProj(ImageProjConfig(cross_attention_dim=12, clip_embeddings_dim=16))
    p = ip.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))
    assert ip.apply(p, jnp.zeros((2, 16))).shape == (2, 4, 12)

    ap_cfg = AudioProjConfig(seq_len=3, blocks=2, channels=4, intermediate_dim=8,
                             output_dim=6, context_tokens=5)
    ap = AudioProj(ap_cfg)
    x = jnp.zeros((2, 4, 3, 2, 4))
    p = ap.init(jax.random.PRNGKey(0), x)
    assert ap.apply(p, x).shape == (2, 4, 5, 6)
