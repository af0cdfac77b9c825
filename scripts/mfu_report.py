"""Quantify the exact-path performance ceiling: FLOPs/step + MFU.

VERDICT r2 asked for a number on the ceiling before more kernel work:
compute FLOPs of (a) ONE denoiser CFG step (the hot 94% of inference) and
(b) the FULL jitted clip program via XLA cost_analysis, measure device
time, and publish MFU = flops / time / peak. If exact-path MFU is already
high, the 10x north star is provably unreachable by re-tiling the same
FLOPs and the strategy legitimately shifts to evaluation reduction
(DPM-Solver++ / caches — scripts/inference.py --profile fast).

Run ONLY on the TPU. Peak used: 197 TF/s bf16 (v5e advertised); the
measured achievable peak on this chip's big convs is ~190 TF/s
(BASELINE.md cost-model notes) — both MFUs are reported.

Env: HALLO_MFU_LOOPS (default 8), HALLO_MFU_CLIP=0 to skip the clip-level
analysis (it needs the bench-warmed compile cache to be cheap).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12      # v5e advertised
PEAK_MEASURED = 190e12  # best sustained conv fusion measured on this chip


def log(msg):
    print(f"# mfu: {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np

    from hallo_tpu.utils.factory import build_models, dummy_clip_inputs

    loops = int(os.environ.get("HALLO_MFU_LOOPS", "8"))
    h = w = 512
    f, m = 16, 2
    dtype = jnp.bfloat16
    models = build_models(
        "full", dtype=dtype, init_key=jax.random.PRNGKey(0), height=h,
        width=w, clip_length=f, n_motion_frames=m, param_dtype=dtype,
    )
    log("params ready")
    den, p = models.denoising_net, models.params

    ip = models.image_proj.config
    ap_cfg = models.audio_proj.config
    hl, wl = h // 8, w // 8
    cfg2 = 2
    ctx = jnp.zeros(
        (cfg2, ip.clip_extra_context_tokens, den.config.cross_attention_dim),
        dtype,
    )
    feat_shapes = jax.eval_shape(
        lambda pr: models.reference_net.apply(
            pr, jnp.zeros((cfg2 * (1 + m), hl, wl, 4), dtype), jnp.zeros(()),
            jnp.zeros((cfg2 * (1 + m), ip.clip_extra_context_tokens,
                       den.config.cross_attention_dim), dtype),
        )[1],
        p["reference_net"],
    )
    ref_feats = jax.tree.map(
        lambda s: jnp.zeros((cfg2,) + s.shape[1:], s.dtype), feat_shapes
    )
    motion_feats = jax.tree.map(
        lambda s: jnp.zeros((cfg2, m) + s.shape[1:], s.dtype), feat_shapes
    )
    audio = jnp.zeros(
        (cfg2, f, ap_cfg.context_tokens, den.config.audio_attention_dim), dtype
    )
    face_cond = jnp.zeros(
        (cfg2, f, hl, wl, den.config.block_out_channels[0]), dtype
    )
    masks = tuple(
        tuple(
            jnp.ones((cfg2 * f, (hl // 2 ** d) * (wl // 2 ** d)), dtype)
            for _ in range(3)
        )
        for d in range(4)
    )
    motion_scale = jnp.ones(3)
    lat = jnp.zeros((cfg2, f, hl, wl, 4), dtype)

    def one_step(p, x):
        return den.apply(
            p["denoising_net"], x, jnp.asarray(500.0), ctx, ref_feats,
            motion_feats, audio, face_cond, masks, motion_scale, None,
            cfg_split=True,
        ).astype(x.dtype)

    step_jit = jax.jit(one_step)
    log("lowering single denoiser step for cost_analysis")
    cost = step_jit.lower(p, lat).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    step_flops = float(cost.get("flops", 0.0))
    step_bytes = float(cost.get("bytes accessed", 0.0))
    log(f"step flops={step_flops:.4g} bytes={step_bytes:.4g}")

    # Device time: in-jit loop with a per-iteration input perturbation so the
    # body is not loop-invariant-hoisted (CLAUDE.md measurement rule); the
    # ~28 ms tunnel roundtrip amortizes over `loops` iterations.
    @jax.jit
    def timing_loop(p, x):
        def body(i, x):
            return one_step(p, x + i.astype(x.dtype) * 1e-30)

        return jax.lax.fori_loop(0, loops, body, x)

    log("compiling timing loop")
    t0 = time.perf_counter()
    float(jnp.sum(timing_loop(p, lat).astype(jnp.float32)))
    log(f"compile+first {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    float(jnp.sum(timing_loop(p, lat).astype(jnp.float32)))
    wall = time.perf_counter() - t0
    step_s = wall / loops
    log(f"{loops} steps wall {wall:.3f}s -> {step_s * 1e3:.1f} ms/step")

    result = {
        "metric": "exact_path_mfu",
        "denoiser_step": {
            "flops": step_flops,
            "bytes_accessed": step_bytes,
            "ms": round(step_s * 1e3, 1),
            "achieved_tflops": round(step_flops / step_s / 1e12, 1),
            "mfu_vs_197tf_peak": round(step_flops / step_s / PEAK_BF16, 4),
            "mfu_vs_190tf_measured_peak": round(
                step_flops / step_s / PEAK_MEASURED, 4
            ),
            "hbm_gbps_lower_bound": round(step_bytes / step_s / 1e9, 1),
        },
    }

    if os.environ.get("HALLO_MFU_CLIP", "1") != "0":
        from hallo_tpu.config import SchedulerConfig
        from hallo_tpu.pipelines.face_animate import FaceAnimatePipeline

        pipe = FaceAnimatePipeline(
            models, SchedulerConfig(), num_inference_steps=40,
            guidance_scale=3.5, clip_length=f, n_motion_frames=m,
        )
        inputs = dummy_clip_inputs(models, h, w, f, m, batch=1)
        ref_image = jnp.asarray(inputs["ref_image"])
        motion = jnp.repeat(ref_image[:, None], m, axis=1)
        ref_pixels = jnp.concatenate([ref_image[:, None], motion], axis=1)
        lat0 = jax.random.normal(
            jax.random.PRNGKey(42), (1, f, hl, wl, 4), jnp.float32
        )
        clip_args = (
            models.params, ref_pixels, lat0,
            jnp.asarray(inputs["audio_windows"])[None],
            jnp.asarray(inputs["face_emb"]),
            jnp.asarray(inputs["face_region"]),
            tuple(tuple(jnp.asarray(x) for x in lvl)
                  for lvl in inputs["masks"]),
            motion_scale,
        )
        # NOTE: cost_analysis on the clip program counts each lax.fori_loop
        # BODY once (XLA does not multiply by trip count), so it wildly
        # undercounts the 40-step denoise loop. Derive clip FLOPs from the
        # separately-analyzed step instead: 40 denoiser steps dominate; the
        # once-per-clip parts (VAE encode/decode, ReferenceNet) are the
        # loop-free remainder of the program's own cost_analysis.
        log("lowering full clip program for cost_analysis")
        ccost = pipe._generate_clip.lower(*clip_args).compile().cost_analysis()
        if isinstance(ccost, (list, tuple)):
            ccost = ccost[0]
        body_once_flops = float(ccost.get("flops", 0.0))
        non_loop_flops = max(body_once_flops - step_flops, 0.0)
        clip_flops = 40 * step_flops + non_loop_flops
        log("timing full clip (sustained already in BENCH; one dispatch here)")
        np.asarray(pipe._generate_clip(*clip_args)[0])  # warm
        t0 = time.perf_counter()
        np.asarray(pipe._generate_clip(*clip_args)[0])
        clip_s = time.perf_counter() - t0
        result["clip_program"] = {
            "flops_derived": clip_flops,
            "flops_cost_analysis_body_once": body_once_flops,
            "seconds": round(clip_s, 3),
            "achieved_tflops": round(clip_flops / clip_s / 1e12, 1),
            "mfu_vs_197tf_peak": round(clip_flops / clip_s / PEAK_BF16, 4),
            "denoiser_share": round(40 * step_flops / clip_flops, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
