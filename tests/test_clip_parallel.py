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
