"""End-to-end FaceAnimatePipeline test on a tiny configuration: shapes,
finiteness, sliding-window motion-frame carry, audio windowing semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hallo_tpu.config import (
    AudioProjConfig,
    FaceLocatorConfig,
    ImageProjConfig,
    MotionModuleConfig,
    SchedulerConfig,
    VAEConfig,
    denoising_unet_config,
    reference_unet_config,
)
from hallo_tpu.pipelines.face_animate import (
    FaceAnimatePipeline,
    HalloModels,
    window_audio_embeddings,
)

TINY = dict(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    num_attention_heads=2,
    cross_attention_dim=12,
    norm_num_groups=4,
    audio_attention_dim=6,
    motion_module=MotionModuleConfig(
        num_attention_heads=2,
        temporal_position_encoding_max_len=8,
        norm_num_groups=4,
    ),
)
VAE_TINY = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1, norm_num_groups=4)
FL_TINY = FaceLocatorConfig(conditioning_embedding_channels=8, block_out_channels=(4, 4, 4, 4))
IP_TINY = ImageProjConfig(cross_attention_dim=12, clip_embeddings_dim=16)
AP_TINY = AudioProjConfig(seq_len=3, blocks=2, channels=4, intermediate_dim=8,
                          output_dim=6, context_tokens=3)


# One init for the whole module (every test uses h=64, f=4, m=2): the six
# jit-inits per test dominated the r2 suite wall clock; build_models also
# hits the HALLO_PARAM_CACHE disk cache across processes. TINY above is
# kept: it mirrors utils/factory.TINY_* and documents the shapes the tests
# assert against.
@pytest.fixture(scope="module")
def tiny_models():
    from hallo_tpu.utils.factory import build_models

    return build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=64, width=64,
        clip_length=4, n_motion_frames=2,
    )


def test_dynamic_allow_mask():
    from hallo_tpu.diffusion.cache import make_allow_mask, make_skip_mask

    allow = make_allow_mask(40, warmup=6, cooldown=4)
    assert not allow[:6].any() and not allow[36:].any()
    assert allow[6:36].all()
    # the static uniform mask only skips inside the allowed band
    skip = make_skip_mask(40, warmup=6, cooldown=4, stride=2)
    assert not (skip & ~allow).any()


def test_window_audio_embeddings_edge_clamp():
    # Matches the reference's clamped +-2 window (scripts/inference.py:95-116).
    emb = np.arange(5, dtype=np.float32)[:, None, None]  # (5, 1, 1)
    win = window_audio_embeddings(emb, margin=2)
    assert win.shape == (5, 5, 1, 1)
    np.testing.assert_array_equal(win[0, :, 0, 0], [0, 0, 0, 1, 2])
    np.testing.assert_array_equal(win[2, :, 0, 0], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(win[4, :, 0, 0], [2, 3, 4, 4, 4])


@pytest.mark.slow
def test_pipeline_dynamic_step_cache(tiny_models):
    """step_cache='dynamic' (TeaCache-style on-device criterion) must stay
    finite/in-range and close to the exact path at a tight threshold."""
    h, f, m = 64, 4, 2
    models = tiny_models

    def run(cache, thresh=0.05):
        pipe = FaceAnimatePipeline(
            models, SchedulerConfig(), num_inference_steps=4,
            guidance_scale=3.5, clip_length=f, n_motion_frames=m,
            step_cache=cache, step_cache_threshold=thresh,
        )
        rng = np.random.default_rng(0)
        ref = rng.uniform(-1, 1, size=(1, h, h, 3)).astype(np.float32)
        audio = rng.normal(size=(f, 3, 2, 4)).astype(np.float32)
        face_emb = rng.normal(size=(1, 16)).astype(np.float32)
        region = np.ones((1, h, h, 3), np.float32)
        hl = h // 8
        masks = tuple(
            tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
            for d in range(4)
        )
        return pipe(ref, audio, face_emb, region, masks, seed=3)

    exact = run(None)
    dyn = run("dynamic")
    assert dyn.shape == exact.shape
    assert np.isfinite(dyn).all()
    assert dyn.min() >= 0.0 and dyn.max() <= 1.0
    # 4 steps with warmup 6 -> allow mask is all-False -> identical output
    np.testing.assert_allclose(dyn, exact, atol=1e-5)

    with pytest.raises(ValueError):
        FaceAnimatePipeline(models, SchedulerConfig(), step_cache="bogus")


@pytest.mark.slow
def test_pipeline_two_clips(tiny_models):
    h, f, m = 64, 4, 2
    models = tiny_models
    pipe = FaceAnimatePipeline(
        models,
        SchedulerConfig(),
        num_inference_steps=2,
        guidance_scale=3.5,
        clip_length=f,
        n_motion_frames=m,
    )
    rng = np.random.default_rng(0)
    ref = rng.uniform(-1, 1, size=(1, h, h, 3)).astype(np.float32)
    audio = rng.normal(size=(2 * f, 3, 2, 4)).astype(np.float32)  # 2 clips
    face_emb = rng.normal(size=(1, 16)).astype(np.float32)
    region = np.ones((1, h, h, 3), np.float32)
    hl = h // 8
    masks = tuple(
        tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
        for d in range(4)
    )
    video = pipe(ref, audio, face_emb, region, masks, audio_length=7)
    assert video.shape == (1, 7, h, h, 3)
    assert np.isfinite(video).all()
    assert video.min() >= 0.0 and video.max() <= 1.0


@pytest.mark.slow
def test_pipeline_dpm_sampler(tiny_models):
    """sampler='dpm++2m' end-to-end (incl. composition with the CFG cache):
    finite, in-range, and close to the DDIM path on a tiny model."""
    h, f, m = 64, 4, 2
    models = tiny_models

    def run(sampler, steps, stride=1):
        pipe = FaceAnimatePipeline(
            models, SchedulerConfig(), num_inference_steps=steps,
            guidance_scale=3.5, clip_length=f, n_motion_frames=m,
            sampler=sampler, cfg_cache_stride=stride,
        )
        rng = np.random.default_rng(0)
        ref = rng.uniform(-1, 1, size=(1, h, h, 3)).astype(np.float32)
        audio = rng.normal(size=(f, 3, 2, 4)).astype(np.float32)
        face_emb = rng.normal(size=(1, 16)).astype(np.float32)
        region = np.ones((1, h, h, 3), np.float32)
        hl = h // 8
        masks = tuple(
            tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
            for d in range(4)
        )
        return pipe(ref, audio, face_emb, region, masks, seed=3)

    ddim_out = run("ddim", 12)
    dpm_out = run("dpm++2m", 12)
    assert dpm_out.shape == ddim_out.shape
    assert np.isfinite(dpm_out).all()
    assert dpm_out.min() >= 0.0 and dpm_out.max() <= 1.0
    # same ODE, different solver: outputs agree to solver truncation error
    diff = np.abs(dpm_out.astype(np.float64) - ddim_out).mean()
    assert diff < 0.1, diff
    assert not np.array_equal(dpm_out, ddim_out)
    # composes with CFG-uncond caching (the body_g path)
    combo = run("dpm++2m", 12, stride=2)
    assert np.isfinite(combo).all()
    assert np.abs(combo.astype(np.float64) - dpm_out).mean() < 0.05


def test_uncond_mask_schedule():
    from hallo_tpu.diffusion.cache import make_uncond_mask

    m = make_uncond_mask(40, stride=3, warmup=6, cooldown=4)
    assert m[:6].all() and m[36:].all()          # warmup/cooldown always on
    assert m[6] and not m[7] and not m[8] and m[9]
    assert make_uncond_mask(40, stride=1).all()  # stride 1 = disabled
    # a 12-step schedule with stride 2 has exactly one cond-only step (i=7)
    m12 = make_uncond_mask(12, stride=2, warmup=6, cooldown=4)
    assert (~m12).sum() == 1 and not m12[7]


@pytest.mark.slow
def test_pipeline_cfg_cache(tiny_models):
    """cfg_cache_stride: cond-only steps reuse the cached uncond prediction.
    With 12 steps / stride 2 exactly one step skips the uncond half; the
    output must stay finite/in-range and close to the exact path."""
    h, f, m = 64, 4, 2
    models = tiny_models

    def run(stride, steps=12):
        pipe = FaceAnimatePipeline(
            models, SchedulerConfig(), num_inference_steps=steps,
            guidance_scale=3.5, clip_length=f, n_motion_frames=m,
            cfg_cache_stride=stride,
        )
        rng = np.random.default_rng(0)
        ref = rng.uniform(-1, 1, size=(1, h, h, 3)).astype(np.float32)
        audio = rng.normal(size=(f, 3, 2, 4)).astype(np.float32)
        face_emb = rng.normal(size=(1, 16)).astype(np.float32)
        region = np.ones((1, h, h, 3), np.float32)
        hl = h // 8
        masks = tuple(
            tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
            for d in range(4)
        )
        return pipe(ref, audio, face_emb, region, masks, seed=3)

    exact = run(1)
    cached = run(2)
    assert cached.shape == exact.shape
    assert np.isfinite(cached).all()
    assert cached.min() >= 0.0 and cached.max() <= 1.0
    # one of twelve steps approximates the uncond half: output stays close
    diff = np.abs(cached.astype(np.float64) - exact).mean()
    assert diff < 0.05, diff
    # and is not bit-identical (the cond-only branch actually ran)
    assert not np.array_equal(cached, exact)

    with pytest.raises(ValueError):
        FaceAnimatePipeline(
            models, SchedulerConfig(), step_cache="uniform", cfg_cache_stride=2
        )


@pytest.mark.slow
def test_pipeline_cfg_cache_composes_with_dynamic(tiny_models):
    """step_cache='dynamic' + cfg_cache_stride>1 (the body_dg path with the
    nested uncond cond): finite, in-range, close to exact."""
    h, f, m = 64, 4, 2
    models = tiny_models

    def run(cache, stride):
        pipe = FaceAnimatePipeline(
            models, SchedulerConfig(), num_inference_steps=12,
            guidance_scale=3.5, clip_length=f, n_motion_frames=m,
            step_cache=cache, step_cache_threshold=0.4,
            cfg_cache_stride=stride,
        )
        rng = np.random.default_rng(0)
        ref = rng.uniform(-1, 1, size=(1, h, h, 3)).astype(np.float32)
        audio = rng.normal(size=(f, 3, 2, 4)).astype(np.float32)
        face_emb = rng.normal(size=(1, 16)).astype(np.float32)
        region = np.ones((1, h, h, 3), np.float32)
        hl = h // 8
        masks = tuple(
            tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
            for d in range(4)
        )
        return pipe(ref, audio, face_emb, region, masks, seed=3)

    exact = run(None, 1)
    combo = run("dynamic", 2)
    assert combo.shape == exact.shape
    assert np.isfinite(combo).all()
    assert combo.min() >= 0.0 and combo.max() <= 1.0
    diff = np.abs(combo.astype(np.float64) - exact).mean()
    assert diff < 0.08, diff


def _tiny_inputs(f=4, h=64, seed=0):
    rng = np.random.default_rng(seed)
    ref = rng.uniform(-1, 1, size=(1, h, h, 3)).astype(np.float32)
    audio = rng.normal(size=(f, 3, 2, 4)).astype(np.float32)
    face_emb = rng.normal(size=(1, 16)).astype(np.float32)
    region = np.ones((1, h, h, 3), np.float32)
    hl = h // 8
    masks = tuple(
        tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
        for d in range(4)
    )
    return ref, audio, face_emb, region, masks


def test_pipeline_cfg_tail_full_equals_no_guidance(tiny_models):
    """cfg_tail == num_steps means guidance weight 1.0 everywhere and zero
    uncond evals — must reproduce the guidance_scale=1.0 pipeline exactly
    (pins the cond-only fast path + per-step guidance-weight combine)."""
    f, m, steps = 4, 2, 4
    inputs = _tiny_inputs(f)
    kwargs = dict(
        num_inference_steps=steps, clip_length=f, n_motion_frames=m,
    )
    tail = FaceAnimatePipeline(
        tiny_models, SchedulerConfig(), guidance_scale=3.5, cfg_tail=steps,
        **kwargs,
    )(*inputs, seed=3)
    plain = FaceAnimatePipeline(
        tiny_models, SchedulerConfig(), guidance_scale=1.0, **kwargs
    )(*inputs, seed=3)
    # Same math, but the cond-only fast path runs the cond half at batch 1
    # while the guidance_scale=1 pipeline runs the CFG pair at batch 2: XLA
    # reassociates reductions differently, which can flip an occasional
    # uint8 quantization decision. Equality up to one quantization level.
    diff = np.abs(tail.astype(np.float64) - plain)
    assert diff.max() <= 1.5 / 255.0, diff.max()
    assert np.mean(diff > 0.5 / 255.0) < 1e-3, np.mean(diff > 0.5 / 255.0)


@pytest.mark.slow
def test_pipeline_cfg_tail_partial(tiny_models):
    """Partial tail: close to the exact CFG path (tail steps are at low
    noise where cond/uncond have converged), not bit-identical, in-range."""
    f, m, steps = 4, 2, 8
    inputs = _tiny_inputs(f)
    kwargs = dict(
        num_inference_steps=steps, clip_length=f, n_motion_frames=m,
        guidance_scale=3.5,
    )
    exact = FaceAnimatePipeline(tiny_models, SchedulerConfig(), **kwargs)(
        *inputs, seed=3
    )
    tail = FaceAnimatePipeline(
        tiny_models, SchedulerConfig(), cfg_tail=2, **kwargs
    )(*inputs, seed=3)
    assert tail.shape == exact.shape
    assert np.isfinite(tail).all()
    assert tail.min() >= 0.0 and tail.max() <= 1.0
    assert not np.array_equal(tail, exact)
    assert np.mean(np.abs(tail.astype(np.float64) - exact)) < 0.08


@pytest.mark.slow
def test_pipeline_logsnr_schedule(tiny_models):
    """timestep_schedule='logsnr' end-to-end with unipc: valid output,
    differs from trailing (the knots moved), composes with the CFG plan."""
    f, m, steps = 4, 2, 8
    inputs = _tiny_inputs(f)
    kwargs = dict(
        num_inference_steps=steps, clip_length=f, n_motion_frames=m,
        guidance_scale=3.5, sampler="unipc",
    )
    trail = FaceAnimatePipeline(tiny_models, SchedulerConfig(), **kwargs)(
        *inputs, seed=3
    )
    ls = FaceAnimatePipeline(
        tiny_models, SchedulerConfig(), timestep_schedule="logsnr",
        schedule_rho=1.5, cfg_cache_stride=3, cfg_tail=2, **kwargs,
    )(*inputs, seed=3)
    assert ls.shape == trail.shape
    assert np.isfinite(ls).all()
    assert ls.min() >= 0.0 and ls.max() <= 1.0
    assert not np.array_equal(ls, trail)
