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

Error bars (VERDICT r3 item 5): the matrix re-runs over several
random-init SEEDS (different networks, same trajectory dynamics) and
several image SIZES, reporting mean/min/max per mode. Params are jit
ARGUMENTS, so extra seeds reuse every trace and compile; extra sizes pay
one compile per mode.

Run ONLY on the TPU. Env: HALLO_EVAL_SCALE=tiny|full,
HALLO_EVAL_THRESHOLDS="0.05,0.10,0.20", HALLO_EVAL_STEPS,
HALLO_EVAL_SEEDS="0,1,2", HALLO_EVAL_SIZES="256,512".
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
    seeds = [
        int(x) for x in os.environ.get("HALLO_EVAL_SEEDS", "0").split(",")
    ]
    if scale == "tiny":
        default_sizes, clip, dtype = "64", 4, jnp.float32
    else:
        default_sizes, clip, dtype = "512", 16, jnp.bfloat16
    sizes = [
        int(x)
        for x in os.environ.get("HALLO_EVAL_SIZES", default_sizes).split(",")
    ]
    m = 2

    from hallo_tpu.utils.lpips import load_lpips, lpips_from_uint8

    lpips_params, lpips_status = load_lpips()
    log(f"lpips: {lpips_status}")

    cfg_stride = int(os.environ.get("HALLO_EVAL_CFG_STRIDE", "3"))
    # (step_cache, threshold, cfg_stride, sampler, n_steps, label, extra)
    # `extra` = additional FaceAnimatePipeline kwargs (cfg_tail,
    # cfg_cache_warmup/cooldown, timestep_schedule, schedule_rho).
    E = {}
    modes = (
        [("uniform", 0.0, 1, "ddim", None, None, E)]
        + [("dynamic", t, 1, "ddim", None, None, E) for t in thresholds]
        + [(None, 0.0, cfg_stride, "ddim", None, None, E)]  # CFG cache alone
        + [("dynamic", thresholds[-1], cfg_stride, "ddim", None, None, E)]
        # DPM-Solver++ (2M) @ 15 evals + CFG-uncond cache stride 3 (the
        # r3 fast profile, kept as the solver-order comparison row), judged
        # against the 40-step DDIM exact output.
        + [(None, 0.0, 3, "dpm++2m", 15, "fast_dpm15", E)]
        # fast_dpm15 + the dynamic step cache on top (the r3 turbo)
        + [("dynamic", thresholds[-1], 3, "dpm++2m", 15, "turbo_dpm15", E)]
    )
    if os.environ.get("HALLO_EVAL_UNIPC", "1") != "0":
        # UniPC (predictor == dpm++2m, plus the UniC corrector): does the
        # corrector buy quality at equal evals, and does it let the fast
        # profile drop below 15 evals? (diffusion/unipc.py — the analytic
        # -ODE margin is only ~2-3%, this is the real-network check.)
        # r4 matrix answer: YES — unipc@12 beats dpm++2m@15 on PSNR/SSIM
        # AND speed at every seed, so it became --profile fast; turbo is
        # unipc@12 + the dynamic step cache on top.
        LEGACY = {"cfg_cache_warmup": 6, "cfg_cache_cooldown": 4}
        modes = modes + [
            (None, 0.0, 3, "unipc", 15, "fast_unipc15", LEGACY),
            # r4's fast profile (40-step-tuned warmup/cooldown: 2 skips)
            (None, 0.0, 3, "unipc", 12, "fast_unipc12_legacy", LEGACY),
            ("dynamic", thresholds[-1], 3, "unipc", 12, "turbo_unipc12", E),
        ]
    if os.environ.get("HALLO_EVAL_R5", "1") != "0":
        # r5 fast-profile candidates (VERDICT item 3), selected by the tiny
        # on-chip pre-screen (BASELINE.md r5: log-SNR respacing and large
        # guidance tails are measured dead ends on the PSNR-vs-exact
        # metric; GRID-NESTED eval counts win — 1000/S spacings with S in
        # {40,20,10,8,5} put every knot exactly on the 40-step trailing
        # grid, and unipc@10 beat unipc@12 at tiny scale 25.8 vs 24.3 dB
        # while being 13% cheaper).
        modes = modes + [
            # pure nested-grid UniPC at 10 evals (no caching at all)
            (None, 0.0, 1, "unipc", 10, "r5_unipc10", E),
            # pure nested-grid UniPC at 8 evals
            (None, 0.0, 1, "unipc", 8, "r5_unipc8", E),
            # 10 evals + mild CFG cache (warmup 4 / cooldown 2, stride 3:
            # two cond-only steps)
            (None, 0.0, 3, "unipc", 10, "r5_unipc10_c42",
             {"cfg_cache_warmup": 4, "cfg_cache_cooldown": 2}),
            # 8 evals + mild CFG cache (one cond-only step)
            (None, 0.0, 3, "unipc", 8, "r5_unipc8_c42",
             {"cfg_cache_warmup": 4, "cfg_cache_cooldown": 2}),
            # 10 evals + guidance off at the final step only
            (None, 0.0, 1, "unipc", 10, "r5_unipc10_t1",
             {"cfg_tail": 1}),
            # 20 nested evals: the near-lossless 2x point of the frontier
            (None, 0.0, 1, "unipc", 20, "r5_unipc20", E),
        ]
    only = os.environ.get("HALLO_EVAL_MODES")
    if only:
        # Comma-separated substrings matched against each mode's label
        # (unlabeled rows match their sampler name) — lets a follow-up run
        # audit ONE new mode without re-measuring the whole matrix.
        keys = [k.strip() for k in only.split(",") if k.strip()]
        modes = [
            mo for mo in modes
            if any(k in (mo[5] or mo[3]) for k in keys)
        ]

    def agg(values):
        vals = [v for v in values if v is not None]
        if not vals:
            return None
        if len(vals) == 1:
            return round(vals[0], 4)
        return {
            "mean": round(float(np.mean(vals)), 4),
            "min": round(float(np.min(vals)), 4),
            "max": round(float(np.max(vals)), 4),
        }

    sections = []
    for size in sizes:
        height = width = size
        log(f"=== size {size} ===")
        # One pipeline per mode per size: params are jit ARGUMENTS, so all
        # seeds share each pipeline's trace + compile.
        # ONE HalloModels object per size; per-seed init_params swaps the
        # param tree in place so only one full param set lives in HBM and
        # every pipeline keeps referring to the same module definitions.
        models0 = build_models(scale, dtype=dtype)

        def make_pipe(step_cache, thresh, cfg_s, sampler, n_steps, extra=None):
            return FaceAnimatePipeline(
                models0,
                SchedulerConfig(), num_inference_steps=n_steps or steps,
                guidance_scale=3.5, clip_length=clip, n_motion_frames=m,
                step_cache=step_cache, step_cache_threshold=thresh,
                cfg_cache_stride=cfg_s, sampler=sampler, **(extra or {}),
            )

        pipes = {}
        per_mode = {None: []}  # mode index -> list of per-seed entries
        for i in range(len(modes)):
            per_mode[i] = []
        for seed in seeds:
            log(f"size {size}: initializing params seed={seed}")
            models0.params = {}  # drop the previous seed's tree first
            models0.init_params(
                jax.random.PRNGKey(seed), height=height, width=width,
                clip_length=clip, n_motion_frames=m,
                param_dtype=(dtype if scale == "full" else None),
            )
            if not pipes:
                pipes["exact"] = make_pipe(None, 0.0, 1, "ddim", None)
                for i, (mode, th, stride, sampler, n_steps, _, ex) in enumerate(
                    modes
                ):
                    pipes[i] = make_pipe(mode, th, stride, sampler, n_steps, ex)
            inputs = dummy_clip_inputs(models0, height, width, clip, m,
                                       batch=1, seed=seed)
            ref_image = jnp.asarray(inputs["ref_image"])
            motion = jnp.repeat(ref_image[:, None], m, axis=1)
            ref_pixels = jnp.concatenate([ref_image[:, None], motion], axis=1)
            latents = jax.random.normal(
                jax.random.PRNGKey(42 + seed),
                (1, clip, height // 8, width // 8, 4), jnp.float32,
            )
            clip_audio = jnp.asarray(inputs["audio_windows"])[None]
            args_tail = (
                clip_audio, jnp.asarray(inputs["face_emb"]),
                jnp.asarray(inputs["face_region"]),
                tuple(
                    tuple(jnp.asarray(x) for x in lvl)
                    for lvl in inputs["masks"]
                ),
                jnp.ones(3),
            )

            def run(pipe):
                t0 = time.perf_counter()
                frames = np.asarray(pipe._generate_clip(
                    models0.params, ref_pixels, latents, *args_tail)[0])
                first_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                frames = np.asarray(pipe._generate_clip(
                    models0.params, ref_pixels, latents, *args_tail)[0])
                return frames, time.perf_counter() - t0, first_s

            exact, exact_s, c0 = run(pipes["exact"])
            log(f"seed {seed} exact {exact_s:.2f}s/clip (first {c0:.0f}s)")
            per_mode[None].append({"clip_seconds": exact_s})
            for i, (mode, th, stride, sampler, n_steps, label, _ex) in enumerate(
                modes
            ):
                frames, run_s, _ = run(pipes[i])
                entry = {
                    "psnr": psnr(frames, exact),
                    "ssim": ssim(frames, exact),
                    "lpips": (
                        lpips_from_uint8(lpips_params, frames, exact)
                        if lpips_params is not None else None
                    ),
                    "mad": float(
                        np.mean(np.abs(frames.astype(np.float64) - exact))
                    ),
                    "clip_seconds": run_s,
                    "speedup": exact_s / run_s,
                }
                log(f"seed {seed} {label or mode}: psnr={entry['psnr']:.2f} "
                    f"ssim={entry['ssim']:.4f} {run_s:.2f}s")
                per_mode[i].append(entry)

        mode_rows = []
        for i, (mode, th, stride, sampler, n_steps, label, _ex) in enumerate(modes):
            rows = per_mode[i]
            mode_rows.append({
                "mode": label or (
                    (mode or "exact") + (f"+cfg{stride}" if stride > 1 else "")
                ),
                "sampler": sampler,
                "steps": n_steps or steps,
                "threshold": th if mode == "dynamic" else None,
                "cfg_cache_stride": stride,
                "psnr_vs_exact_db": agg([r["psnr"] for r in rows]),
                "ssim_vs_exact": agg([r["ssim"] for r in rows]),
                "lpips_vs_exact": agg([r["lpips"] for r in rows]),
                "mean_abs_diff": agg([r["mad"] for r in rows]),
                "clip_seconds": agg([r["clip_seconds"] for r in rows]),
                "speedup_vs_exact": agg([r["speedup"] for r in rows]),
            })
        sections.append({
            "size": size,
            "seeds": seeds,
            "exact_clip_seconds": agg(
                [r["clip_seconds"] for r in per_mode[None]]
            ),
            "modes": mode_rows,
        })

    print(json.dumps({
        "metric": "step_cache_quality_audit",
        "scale": scale,
        "steps": steps,
        "weights": "random-init (relative numbers; see docstring)",
        "lpips": lpips_status,
        "sections": sections,
    }))


if __name__ == "__main__":
    main()
