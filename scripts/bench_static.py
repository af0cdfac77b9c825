"""BASELINE config-2 measurement: the stage-1 spatial-only path
(ReferenceNet + FaceLocator + 2D-mode denoiser, single frame, 40-step DDIM
CFG at 512²). Prints one JSON line (images/sec/chip). Run alone on the chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from hallo_tpu.pipelines.static import StaticPipeline
    from hallo_tpu.utils.factory import build_models

    h = w = int(os.environ.get("HALLO_BENCH_SIZE", "512"))
    steps = int(os.environ.get("HALLO_BENCH_STEPS", "40"))
    dtype = jnp.bfloat16
    models = build_models(
        "full", dtype=dtype, init_key=jax.random.PRNGKey(0), height=h, width=w,
        clip_length=1, n_motion_frames=0, param_dtype=dtype,
        unet_overrides=dict(
            use_motion_module=False, use_audio_module=False,
            use_inflated_groupnorm=False,
        ),
    )
    pipe = StaticPipeline(models, num_inference_steps=steps)
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 3)), jnp.float32)
    face_emb = jnp.asarray(rng.normal(size=(1, 512)), jnp.float32)
    region = jnp.ones((1, h, w, 3), jnp.float32)

    def run():
        img = pipe(ref, face_emb, region, seed=42)
        return np.asarray(img)

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "metric": f"static_images_per_sec_{h}x{w}_{steps}step",
        "value": round(1.0 / best, 4),
        "unit": "images/sec/chip",
        "detail": {"seconds_per_image": round(best, 3),
                   "all": [round(t, 3) for t in times],
                   "compile_plus_first_s": round(compile_s, 1)},
    }))


if __name__ == "__main__":
    main()
