"""BASELINE config 5: stage-2 training step at the reference workload —
512², 14-frame clip + 2 motion frames, bf16 compute, remat (gradient
checkpointing), batch 1/chip — measured on the real chip.

Reference workload: configs/train/stage2.yaml (train_bs 4/GPU on A100-80GB;
v5e has 16 GB so bs/chip=1 with remat is the comparable point — scale via
the data mesh axis).

Run ONLY on the TPU (one process may hold the chip).
Env: HALLO_TRAIN_BENCH_FRAMES (default 14), HALLO_TRAIN_BENCH_SIZE (512),
HALLO_TRAIN_BENCH_REMAT (1), HALLO_TRAIN_BENCH_REPEATS (3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(msg):
    print(f"# train-bench: {msg}", file=sys.stderr, flush=True)


def main():
    from hallo_tpu.utils.factory import build_models
    from hallo_tpu.train.state import (
        OptimizerConfig, TrainState, label_params, make_optimizer,
        stage2_trainable,
    )
    from hallo_tpu.train.step import TrainConfig, make_train_step

    h = w = int(os.environ.get("HALLO_TRAIN_BENCH_SIZE", "512"))
    f = int(os.environ.get("HALLO_TRAIN_BENCH_FRAMES", "14"))
    m = 2
    b = int(os.environ.get("HALLO_TRAIN_BENCH_BATCH", "1"))
    remat = os.environ.get("HALLO_TRAIN_BENCH_REMAT", "1") == "1"
    # Nested per-layer remat: required to fit 512²x14f bs1 in 16 GB HBM
    # (block-level remat alone measured 22.16 G needed; the replay of one
    # block holds all its intra-layer temps at once).
    remat_inner = os.environ.get("HALLO_TRAIN_BENCH_REMAT_INNER", "1") == "1"
    repeats = int(os.environ.get("HALLO_TRAIN_BENCH_REPEATS", "3"))

    mixed = os.environ.get("HALLO_TRAIN_BENCH_MIXED", "1") == "1"
    log(f"building full-width models {h}x{w} f={f} b={b} remat={remat} "
        f"inner={remat_inner} bf16 mixed_frozen={mixed}")
    models = build_models(
        "full", dtype=jnp.bfloat16, init_key=jax.random.PRNGKey(0),
        height=h, width=w, clip_length=f, n_motion_frames=m,
        unet_overrides=dict(remat=remat, remat_inner=remat and remat_inner),
    )
    labels = label_params(models.params, stage2_trainable)
    if mixed:
        # All-fp32 params OOM on a 16 GB v5e (measured r3: 24.0 G needed —
        # ~7.2 G fp32 params + moments + 9.3 G program temps). Stage 2
        # freezes everything except motion/audio modules + audio_proj, and
        # the forward casts to bf16 regardless, so frozen masters carry no
        # value in fp32: keep fp32 ONLY for the optimizer-updated leaves
        # (the reference itself trains fp16 weights — stage2.yaml
        # weight_dtype). This is the documented OOM fix.
        models.params = jax.tree.map(
            lambda p, l: (
                p.astype(jnp.bfloat16)
                if l == "freeze" and jnp.issubdtype(p.dtype, jnp.floating)
                else p
            ),
            models.params, labels,
        )
    # reference stage-2 parity: bnb AdamW8bit (stage2.yaml use_8bit_adam)
    adam8 = os.environ.get("HALLO_TRAIN_BENCH_8BIT", "1") == "1"
    tx = make_optimizer(OptimizerConfig(use_8bit_adam=adam8), labels)
    state = TrainState.create(models.params, tx)
    step_fn = jax.jit(
        make_train_step(models, tx, TrainConfig(stage=2)), donate_argnums=(0,)
    )

    ip = models.image_proj.config
    ap = models.audio_proj.config
    hl = h // 8
    rng = np.random.default_rng(0)
    batch = dict(
        pixel_values=rng.uniform(-1, 1, (b, f, h, w, 3)).astype(np.float32),
        ref_pixels=rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        motion_pixels=rng.uniform(-1, 1, (b, m, h, w, 3)).astype(np.float32),
        audio_windows=rng.normal(
            size=(b, f, ap.seq_len, ap.blocks, ap.channels)
        ).astype(np.float32),
        face_emb=rng.normal(size=(b, ip.clip_embeddings_dim)).astype(np.float32),
        face_region=np.ones((b, h, w, 3), np.float32),
        masks=tuple(
            tuple(np.ones((b, (hl // 2**d) ** 2), np.float32) for _ in range(3))
            for d in range(4)
        ),
    )
    batch = jax.tree.map(jnp.asarray, batch)

    log("compiling train step (first call)")
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # forces completion through the tunnel
    log(f"compile+first {time.perf_counter() - t0:.1f}s loss={loss:.4f}")
    assert np.isfinite(loss)

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2 + i))
        loss = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
        log(f"step {i}: {times[-1]:.3f}s loss={loss:.4f}")
    best = min(times)
    hbm_peak_gb = None
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        if peak:
            hbm_peak_gb = round(peak / 2**30, 3)
    except Exception as e:  # the axon tunnel may not forward memory_stats
        log(f"memory_stats unavailable: {e}")
    import json

    print(json.dumps({
        "metric": f"stage2_train_step_{h}x{w}_{f}f_b{b}",
        "value": round(best, 4),
        "unit": "sec/step",
        "remat": remat,
        "remat_inner": remat_inner,
        "dtype": "bf16",
        "mixed_frozen_bf16": mixed,
        "adam8bit": adam8,
        "flash_bwd": os.environ.get("HALLO_FLASH_BWD", "pallas"),
        "hbm_peak_gb": hbm_peak_gb,
        "all_step_seconds": [round(t, 4) for t in times],
    }))


if __name__ == "__main__":
    main()
