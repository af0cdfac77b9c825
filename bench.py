"""Benchmark harness: frames/sec/chip for the full inference clip program.

Runs the production workload (configs/inference/default.yaml:6-18): 512x512,
40-step DDIM, CFG 3.5, 16-frame clip with 2 motion frames — the entire
per-clip program (VAE encode refs -> ReferenceNet -> 40x CFG denoise ->
batched VAE decode) as one jitted XLA program on the available chip, bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against an A100 PyTorch estimate of ~0.8 frames/sec (40-step DDIM CFG at
512^2 is ~65 UNet3D+ReferenceNet evals per 16-frame clip) until the
reference baseline is measured for real — see BASELINE.md action item.

Env knobs: HALLO_BENCH_SCALE=tiny|full, HALLO_BENCH_STEPS, HALLO_BENCH_REPEATS,
HALLO_BENCH_SAMPLER=ddim|dpm++2m, HALLO_BENCH_FAST=1|0 (also measure the named
"fast" profile — dpm++2m @ 15 evals + cfg_cache_stride 3, the audited
quality-traded mode of scripts/inference.py --profile fast — and report it
under detail.fast_profile; the headline stays the exact path).
"""

from __future__ import annotations

import json
import os
import time


# Estimated A100 fp16 xformers baseline for the reference (frames/sec at
# 512^2, 40-step DDIM, 16-frame clips). Marked estimate until measured.
A100_BASELINE_FPS_ESTIMATE = 0.8


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp

    from hallo_tpu.config import SchedulerConfig
    from hallo_tpu.pipelines.face_animate import FaceAnimatePipeline
    from hallo_tpu.utils.factory import build_models, dummy_clip_inputs

    scale = os.environ.get("HALLO_BENCH_SCALE", "full")
    steps = int(os.environ.get("HALLO_BENCH_STEPS", "40"))
    repeats = int(os.environ.get("HALLO_BENCH_REPEATS", "3"))
    if scale == "tiny":
        height = width = 64
        clip = 4
        dtype = jnp.float32
    else:
        height = width = 512
        clip = 16
        dtype = jnp.bfloat16

    import sys

    def log(msg):
        print(f"# bench: {msg}", file=sys.stderr, flush=True)

    log(f"building models scale={scale} steps={steps}")
    m = 2
    models = build_models(
        scale, dtype=dtype, init_key=jax.random.PRNGKey(0),
        height=height, width=width, clip_length=clip, n_motion_frames=m,
        param_dtype=(dtype if scale == "full" else None),
    )
    log("params initialized")
    # HALLO_BENCH_STEP_CACHE=uniform: cached-prediction step skipping
    # (diffusion/cache.py) — the quality-traded fast mode; the default
    # (exact) path is the headline number.
    step_cache = os.environ.get("HALLO_BENCH_STEP_CACHE") or None
    cache_thresh = float(os.environ.get("HALLO_BENCH_CACHE_THRESH", "0.10"))
    cfg_stride = int(os.environ.get("HALLO_BENCH_CFG_STRIDE", "1"))
    sampler = os.environ.get("HALLO_BENCH_SAMPLER", "ddim")
    pipe = FaceAnimatePipeline(
        models,
        SchedulerConfig(),
        num_inference_steps=steps,
        guidance_scale=3.5,
        clip_length=clip,
        n_motion_frames=m,
        step_cache=step_cache,
        step_cache_threshold=cache_thresh,
        cfg_cache_stride=cfg_stride,
        sampler=sampler,
    )
    # HALLO_BENCH_BATCH > 1 measures the long-form config (BASELINE.md
    # config 4): several identities generated in one batched clip program.
    batch = int(os.environ.get("HALLO_BENCH_BATCH", "1"))
    inputs = dummy_clip_inputs(models, height, width, clip, m, batch=batch)

    # Build device args once; time only the compiled clip program.
    ref_image = jnp.asarray(inputs["ref_image"])
    motion = jnp.repeat(ref_image[:, None], m, axis=1)
    ref_pixels = jnp.concatenate([ref_image[:, None], motion], axis=1)
    latents = jax.random.normal(
        jax.random.PRNGKey(42), (batch, clip, height // 8, width // 8, 4), jnp.float32
    )
    clip_audio = jnp.broadcast_to(
        jnp.asarray(inputs["audio_windows"])[None],
        (batch,) + inputs["audio_windows"].shape,
    )
    face_emb = jnp.asarray(inputs["face_emb"])
    face_region = jnp.asarray(inputs["face_region"])
    masks = tuple(tuple(jnp.asarray(x) for x in lvl) for lvl in inputs["masks"])
    motion_scale = jnp.ones(3)

    args = (models.params, ref_pixels, latents, clip_audio, face_emb,
            face_region, masks, motion_scale)

    # NOTE: block_until_ready does not reliably synchronize through the axon
    # TPU tunnel; materialize the frames to host (np.asarray) instead. This
    # includes the host transfer — honest for the end-to-end metric.
    import numpy as np

    log("compiling clip program")
    t0 = time.perf_counter()
    np.asarray(pipe._generate_clip(*args)[0])
    compile_and_first_s = time.perf_counter() - t0
    log(f"compile+first done in {compile_and_first_s:.1f}s")

    # Per-clip latency: dispatch + full host fetch, serialized.
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(pipe._generate_clip(*args)[0])
        times.append(time.perf_counter() - t0)
    best = min(times)

    # Sustained throughput: the production sliding-window loop — clip c+1 is
    # dispatched through the ON-DEVICE motion carry before clip c's frames
    # are fetched, so the uint8 host fetch overlaps the next clip's denoise
    # (pipelines/face_animate.py __call__ does exactly this).
    def measure_sustained(p, n_clips):
        base = list(args)
        t0 = time.perf_counter()
        pending = None
        for _ in range(n_clips):
            frames, motion = p._generate_clip(*base)
            base[1] = jnp.concatenate([base[1][:, :1], motion], axis=1)
            if pending is not None:
                np.asarray(pending)
            pending = frames
        np.asarray(pending)
        return (time.perf_counter() - t0) / n_clips

    n_clips = max(repeats, 2)
    sustained_s = measure_sustained(pipe, n_clips)
    fps = batch * clip / sustained_s

    # Named "fast" profile: measured in the same run so BENCH_r*.json
    # carries exact AND fast numbers. The definition comes from
    # scripts/inference.py PROFILE_DEFAULTS (one source of truth — the
    # audited quality-traded mode of BASELINE.md's speed/quality matrix).
    fast_detail = None
    if os.environ.get("HALLO_BENCH_FAST", "1") != "0" and step_cache is None \
            and cfg_stride == 1 and sampler == "ddim":
        from scripts.inference import PROFILE_DEFAULTS

        prof = dict(PROFILE_DEFAULTS["fast"])
        fast_steps = prof.pop("inference_steps")
        log(f"compiling fast profile ({prof.get('sampler')} @ {fast_steps} "
            f"+ {prof})")
        fast_pipe = FaceAnimatePipeline(
            models, SchedulerConfig(), num_inference_steps=fast_steps,
            guidance_scale=3.5, clip_length=clip, n_motion_frames=m,
            **prof,
        )
        t0 = time.perf_counter()
        np.asarray(fast_pipe._generate_clip(*args)[0])
        fast_compile_s = time.perf_counter() - t0
        log(f"fast profile compile+first {fast_compile_s:.1f}s")
        fast_sustained = measure_sustained(fast_pipe, n_clips)
        fast_detail = {
            "fps": round(batch * clip / fast_sustained, 4),
            "clip_seconds_sustained": round(fast_sustained, 4),
            "steps": fast_steps,
            **prof,
            "compile_plus_first_s": round(fast_compile_s, 2),
            "quality_note": "PSNR/SSIM-vs-exact audited in BASELINE.md "
                            "(scripts/eval_cache_quality.py fast-profile row)",
        }

    result = {
        "metric": f"frames_per_sec_per_chip_{height}x{width}_{steps}step_{sampler}",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_BASELINE_FPS_ESTIMATE, 3),
        "detail": {
            "clip_seconds_sustained": round(sustained_s, 4),
            "clip_seconds_latency": round(best, 4),
            "all_clip_seconds": [round(t, 4) for t in times],
            "compile_plus_first_s": round(compile_and_first_s, 2),
            # clip COMPUTE only (denoise + decode); the true end-to-end
            # number incl. preprocess/write is scripts/bench_e2e.py's
            # e2e_seconds_per_1s_output.
            "compute_seconds_per_1s_output": round(best / (clip / 25.0), 3),
            "device": str(jax.devices()[0]),
            "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
            "scale": scale,
            "steps": steps,
            "batch": batch,
            "step_cache": step_cache,
            "cfg_cache_stride": cfg_stride,
            "sampler": sampler,
            "fast_profile": fast_detail,
            "baseline_note": "A100 fps is an estimate; reference publishes none",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
