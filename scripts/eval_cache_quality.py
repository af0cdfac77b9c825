"""Quality audit of the step-cache acceleration modes vs the exact path.

Runs the SAME clip program inputs through the exact pipeline and through
each caching mode (uniform / dynamic at one or more thresholds), then
reports per-mode PSNR / mean-abs-diff of the decoded frames against the
exact output, plus the measured clip time. This anchors the quality claim
behind the opt-in fast modes (BASELINE.md) with a number, not an
adjective.

Caveat (documented, not hidden): weights are random-init in this
environment, so absolute perceptual quality is meaningless — but the
caching error is measured THROUGH the same dynamics that produce the real
output (40-step DDIM trajectory of a fixed network), so the relative
ranking of modes and the order of magnitude of the deviation transfer.
With a real checkpoint loaded (scripts/inference.py --net), the same
script measures production numbers.

Run ONLY on the TPU. Env: HALLO_EVAL_SCALE=tiny|full,
HALLO_EVAL_THRESHOLDS="0.05,0.10,0.20", HALLO_EVAL_STEPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"# eval: {msg}", file=sys.stderr, flush=True)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0  # identical output (e.g. no steps skipped); JSON-safe
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def ssim(a: np.ndarray, b: np.ndarray, win: int = 8) -> float:
    """Mean SSIM over non-overlapping win x win luminance patches (standard
    constants; global form per patch — adequate for a regression audit)."""
    a = a.astype(np.float64).mean(axis=-1)  # (.., H, W) luminance
    b = b.astype(np.float64).mean(axis=-1)
    a = a.reshape(-1, *a.shape[-2:])
    b = b.reshape(-1, *b.shape[-2:])
    h, w = a.shape[-2:]
    h, w = h - h % win, w - w % win
    pa = a[:, :h, :w].reshape(-1, h // win, win, w // win, win)
    pb = b[:, :h, :w].reshape(-1, h // win, win, w // win, win)
    ax = (2, 4)
    mu_a, mu_b = pa.mean(ax), pb.mean(ax)
    va, vb = pa.var(ax), pb.var(ax)
    cov = (pa * pb).mean(ax) - mu_a * mu_b
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from hallo_tpu.config import SchedulerConfig
    from hallo_tpu.pipelines.face_animate import FaceAnimatePipeline
    from hallo_tpu.utils.factory import build_models, dummy_clip_inputs

    scale = os.environ.get("HALLO_EVAL_SCALE", "full")
    steps = int(os.environ.get("HALLO_EVAL_STEPS", "40"))
    thresholds = [
        float(t)
        for t in os.environ.get("HALLO_EVAL_THRESHOLDS", "0.10").split(",")
    ]
    if scale == "tiny":
        height = width = 64
        clip = 4
        dtype = jnp.float32
    else:
        height = width = 512
        clip = 16
        dtype = jnp.bfloat16
    m = 2

    log(f"building models scale={scale}")
    models = build_models(
        scale, dtype=dtype, init_key=jax.random.PRNGKey(0),
        height=height, width=width, clip_length=clip, n_motion_frames=m,
        param_dtype=(dtype if scale == "full" else None),
    )
    inputs = dummy_clip_inputs(models, height, width, clip, m, batch=1)
    ref_image = jnp.asarray(inputs["ref_image"])
    motion = jnp.repeat(ref_image[:, None], m, axis=1)
    ref_pixels = jnp.concatenate([ref_image[:, None], motion], axis=1)
    latents = jax.random.normal(
        jax.random.PRNGKey(42), (1, clip, height // 8, width // 8, 4),
        jnp.float32,
    )
    clip_audio = jnp.asarray(inputs["audio_windows"])[None]
    args_tail = (
        clip_audio, jnp.asarray(inputs["face_emb"]),
        jnp.asarray(inputs["face_region"]),
        tuple(tuple(jnp.asarray(x) for x in lvl) for lvl in inputs["masks"]),
        jnp.ones(3),
    )

    def run(step_cache, thresh, cfg_stride=1, sampler="ddim", n_steps=None):
        pipe = FaceAnimatePipeline(
            models, SchedulerConfig(), num_inference_steps=n_steps or steps,
            guidance_scale=3.5, clip_length=clip, n_motion_frames=m,
            step_cache=step_cache, step_cache_threshold=thresh,
            cfg_cache_stride=cfg_stride, sampler=sampler,
        )
        t0 = time.perf_counter()
        frames = np.asarray(
            pipe._generate_clip(models.params, ref_pixels, latents, *args_tail)[0]
        )
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        frames = np.asarray(
            pipe._generate_clip(models.params, ref_pixels, latents, *args_tail)[0]
        )
        run_s = time.perf_counter() - t0
        return frames, run_s, compile_s

    log("running exact path")
    exact, exact_s, c0 = run(None, 0.0)
    log(f"exact {exact_s:.2f}s/clip (compile {c0:.0f}s)")

    # LPIPS (the north-star acceptance metric) — computed when weights are
    # present (pretrained_models/lpips_alex.pth or $HALLO_LPIPS_WEIGHTS),
    # otherwise the column reports the skip reason.
    from hallo_tpu.utils.lpips import load_lpips, lpips_from_uint8

    lpips_params, lpips_status = load_lpips()
    log(f"lpips: {lpips_status}")

    cfg_stride = int(os.environ.get("HALLO_EVAL_CFG_STRIDE", "3"))
    # (step_cache, threshold, cfg_stride, sampler, n_steps, label)
    modes = (
        [("uniform", 0.0, 1, "ddim", None, None)]
        + [("dynamic", t, 1, "ddim", None, None) for t in thresholds]
        + [(None, 0.0, cfg_stride, "ddim", None, None)]   # CFG cache alone
        + [("dynamic", thresholds[-1], cfg_stride, "ddim", None, None)]
        # the named fast profile (scripts/inference.py --profile fast):
        # DPM-Solver++ (2M) @ 15 evals + CFG-uncond cache stride 3, judged
        # against the 40-step DDIM exact output.
        + [(None, 0.0, 3, "dpm++2m", 15, "fast_profile")]
        # --profile turbo: fast + the dynamic step cache on top
        + [("dynamic", thresholds[-1], 3, "dpm++2m", 15, "turbo_profile")]
    )
    results = []
    for mode, th, stride, sampler, n_steps, label in modes:
        log(f"running {label or mode} thresh={th} cfg_stride={stride} "
            f"sampler={sampler} steps={n_steps or steps}")
        frames, run_s, comp_s = run(mode, th, stride, sampler, n_steps)
        entry = {
            "mode": label or (
                (mode or "exact") + (f"+cfg{stride}" if stride > 1 else "")
            ),
            "sampler": sampler,
            "steps": n_steps or steps,
            "threshold": th if mode == "dynamic" else None,
            "cfg_cache_stride": stride,
            "psnr_vs_exact_db": round(psnr(frames, exact), 2),
            "ssim_vs_exact": round(ssim(frames, exact), 4),
            "lpips_vs_exact": (
                round(lpips_from_uint8(lpips_params, frames, exact), 4)
                if lpips_params is not None else None
            ),
            "mean_abs_diff": round(
                float(np.mean(np.abs(frames.astype(np.float64) - exact))), 3
            ),
            "clip_seconds": round(run_s, 3),
            "speedup_vs_exact": round(exact_s / run_s, 3),
        }
        log(str(entry))
        results.append(entry)

    print(json.dumps({
        "metric": "step_cache_quality_audit",
        "exact_clip_seconds": round(exact_s, 3),
        "scale": scale,
        "steps": steps,
        "weights": "random-init (relative numbers; see docstring)",
        "lpips": lpips_status,
        "modes": results,
    }))


if __name__ == "__main__":
    main()
