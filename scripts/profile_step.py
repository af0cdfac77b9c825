"""Profile one denoiser step (the hot 94% of inference) on the real chip.

Usage: python scripts/profile_step.py [--loops 3] [--top 20]

Jits a fori_loop of `loops` denoiser forwards (so per-dispatch tunnel
overhead amortizes out), captures an xprof trace, and prints the hlo_stats
device-time breakdown via hallo_tpu.utils.profiling.summarize_hlo_stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--trace-dir", default="/tmp/hallo_prof")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import numpy as np

    from hallo_tpu.utils.factory import build_models, dummy_clip_inputs
    from hallo_tpu.utils import profiling

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    h = w = 512
    f, m = 16, 2
    dtype = jnp.bfloat16
    models = build_models(
        "full", dtype=dtype, init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=f, n_motion_frames=m, param_dtype=dtype,
    )
    log("params ready")
    den, p = models.denoising_net, models.params

    ip = models.image_proj.config
    ap_cfg = models.audio_proj.config
    hl, wl = h // 8, w // 8
    b = 1
    cfg2 = 2 * b
    ctx = jnp.zeros((cfg2, ip.clip_extra_context_tokens, den.config.cross_attention_dim), dtype)

    feat_shapes = jax.eval_shape(
        lambda pr: models.reference_net.apply(
            pr, jnp.zeros((cfg2 * (1 + m), hl, wl, 4), dtype), jnp.zeros(()),
            jnp.zeros((cfg2 * (1 + m), ip.clip_extra_context_tokens,
                       den.config.cross_attention_dim), dtype),
        )[1],
        p["reference_net"],
    )
    ref_feats = jax.tree.map(lambda s: jnp.zeros((cfg2,) + s.shape[1:], s.dtype), feat_shapes)
    motion_feats = jax.tree.map(
        lambda s: jnp.zeros((cfg2, m) + s.shape[1:], s.dtype), feat_shapes
    )
    audio = jnp.zeros((cfg2, f, ap_cfg.context_tokens, den.config.audio_attention_dim), dtype)
    face_cond = jnp.zeros((cfg2, f, hl, wl, den.config.block_out_channels[0]), dtype)
    masks = tuple(
        tuple(jnp.ones((cfg2 * f, (hl // 2 ** d) * (wl // 2 ** d)), dtype) for _ in range(3))
        for d in range(4)
    )
    motion_scale = jnp.ones(3)
    lat = jnp.zeros((cfg2, f, hl, wl, 4), dtype)

    @jax.jit
    def loop(p, lat):
        def body(i, x):
            out = den.apply(
                p["denoising_net"], x, jnp.asarray(500.0), ctx, ref_feats,
                motion_feats, audio, face_cond, masks, motion_scale, None,
                cfg_split=True,
            )
            return out.astype(x.dtype)

        return jax.lax.fori_loop(0, args.loops, body, lat)

    log("compiling step loop")
    t0 = time.perf_counter()
    float(jnp.sum(loop(p, lat).astype(jnp.float32)))
    log(f"compile+first {time.perf_counter() - t0:.1f}s")

    with profiling.trace(args.trace_dir):
        t0 = time.perf_counter()
        float(jnp.sum(loop(p, lat).astype(jnp.float32)))
        wall = time.perf_counter() - t0
    log(f"{args.loops} steps wall {wall:.3f}s -> {wall / args.loops * 1e3:.1f} ms/step")

    stats = profiling.summarize_hlo_stats(args.trace_dir, top_n=args.top)
    stats["ms_per_step_device"] = stats["total_ms"] / args.loops
    print(json.dumps(stats, indent=1))


if __name__ == "__main__":
    main()
