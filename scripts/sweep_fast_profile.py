"""CPU pre-screen for r5 fast-profile candidates (VERDICT item 3).

Sweeps schedule (trailing vs logsnr x rho), CFG-cache warmup/cooldown, and
guidance-tail truncation at TINY scale against the tiny 40-step DDIM exact
path, reporting PSNR + the modeled cost in full-step units (uncond evals
count ~0.45, cond ~0.55 of a full CFG step — BASELINE.md measured split).

This is a RANKING pre-screen only: tiny random-init nets at 64² do not
predict absolute full-width PSNR, but the schedule/mask trade-offs act
through the same solver algebra. The top candidates go to the on-chip
matrix (scripts/eval_cache_quality.py HALLO_EVAL_R5 rows) for the real
numbers. Runs on CPU; do not run while the chip is benching (host dispatch
contention).

Env: HALLO_SWEEP_SEEDS="0,1,2", HALLO_SWEEP_STEPS="10,12,14".
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"# sweep: {msg}", file=sys.stderr, flush=True)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else float(10 * np.log10(1.0 / mse))


def main():
    import jax
    import jax.numpy as jnp

    from hallo_tpu.config import SchedulerConfig
    from hallo_tpu.diffusion.cache import make_cfg_plan
    from hallo_tpu.pipelines.face_animate import FaceAnimatePipeline
    from hallo_tpu.utils.factory import build_models

    seeds = [int(s) for s in os.environ.get("HALLO_SWEEP_SEEDS", "0,1,2").split(",")]
    step_counts = [
        int(s) for s in os.environ.get("HALLO_SWEEP_STEPS", "12").split(",")
    ]
    h = 64
    f, m = 4, 2

    models = build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=h, width=h,
        clip_length=f, n_motion_frames=m,
    )

    def inputs_for(seed):
        rng = np.random.default_rng(seed)
        ref = rng.uniform(-1, 1, (1, h, h, 3)).astype(np.float32)
        ap = models.audio_proj.config
        audio = rng.normal(size=(f, ap.seq_len, ap.blocks, ap.channels)).astype(
            np.float32
        )
        emb = rng.normal(
            size=(1, models.image_proj.config.clip_embeddings_dim)
        ).astype(np.float32)
        region = np.ones((1, h, h, 3), np.float32)
        hl = h // 8
        masks = tuple(
            tuple(np.ones((1, (hl // 2**d) ** 2), np.float32) for _ in range(3))
            for d in range(4)
        )
        return ref, audio, emb, region, masks

    def run(seed, **kw):
        pipe = FaceAnimatePipeline(
            models, SchedulerConfig(), guidance_scale=3.5, clip_length=f,
            n_motion_frames=m, **kw,
        )
        return np.asarray(pipe(*inputs_for(seed), seed=100 + seed))

    def cost_units(steps, stride, warmup, cooldown, tail):
        un_mask, _ = make_cfg_plan(steps, stride, 3.5, warmup, cooldown, tail)
        n_full = int(un_mask.sum())
        return n_full * 1.0 + (steps - n_full) * 0.55

    # exact reference per seed (40-step DDIM trailing)
    exacts = {}
    for s in seeds:
        t0 = time.time()
        exacts[s] = run(s, num_inference_steps=40)
        log(f"seed {s} exact done in {time.time() - t0:.0f}s")

    # Pruned list: every distinct config is a fresh XLA compile (the plan
    # masks/schedule knots bake in as constants), so 8 candidates, not 25.
    # Override via HALLO_SWEEP_GRID='[[steps,"sched",rho,w,c,tail],...]'.
    grid = [
        ("trailing", 1.0, 6, 4, 0),  # r4 legacy fast (baseline row)
        ("trailing", 1.0, 2, 1, 0),  # adaptive mask alone
        ("trailing", 1.0, 2, 1, 3),  # + guidance tail
        ("logsnr", 0.75, 2, 1, 0),
        ("logsnr", 1.0, 2, 1, 0),
        ("logsnr", 1.5, 2, 1, 0),
        ("logsnr", 1.0, 2, 1, 3),
        ("logsnr", 1.5, 2, 1, 3),
    ]
    env_grid = os.environ.get("HALLO_SWEEP_GRID")
    if env_grid:
        rows = json.loads(env_grid)
        candidates = [
            dict(steps=int(st), sched=s, rho=float(r), warmup=int(w),
                 cooldown=int(c), tail=int(t))
            for (st, s, r, w, c, t) in rows
        ]
    else:
        candidates = [
            dict(steps=steps, sched=s, rho=r, warmup=w, cooldown=c, tail=t)
            for steps in step_counts
            for (s, r, w, c, t) in grid
        ]

    rows = []
    for c in candidates:
        vals = []
        for s in seeds:
            out = run(
                s, num_inference_steps=c["steps"], sampler="unipc",
                cfg_cache_stride=3, cfg_cache_warmup=c["warmup"],
                cfg_cache_cooldown=c["cooldown"], cfg_tail=c["tail"],
                timestep_schedule=c["sched"], schedule_rho=c["rho"],
            )
            vals.append(psnr(out, exacts[s]))
        cost = cost_units(c["steps"], 3, c["warmup"], c["cooldown"], c["tail"])
        row = dict(c, psnr_mean=round(float(np.mean(vals)), 3),
                   psnr_min=round(float(np.min(vals)), 3),
                   cost_units=round(cost, 2))
        rows.append(row)
        log(f"{row}")

    rows.sort(key=lambda r: -r["psnr_mean"])
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
