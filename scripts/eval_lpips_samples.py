"""LPIPS exact-vs-fast on the reference's own inference samples.

The north-star acceptance is LPIPS parity on the HF inference samples
(BASELINE.json). When real weights exist (`pretrained_models/` with net.pth
+ wav2vec + vae) this script renders examples/reference_images/1.jpg +
examples/driving_audios/1.wav twice through the CLI path — the exact
profile and the named fast profile (dpm++2m @ 15 evals + CFG cache) — and
reports frame-wise LPIPS between them (plus PSNR), i.e. the perceptual
price of the speedup on production content.

In an environment without the weights it prints the skip reason and exits
0 (same gating convention as scripts/eval_cache_quality.py).

Usage: python scripts/eval_lpips_samples.py [--config CONFIG]
       [--image IMG] [--audio WAV] [--steps-fast 15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/inference/default.yaml")
    ap.add_argument("--image", default="examples/reference_images/1.jpg")
    ap.add_argument("--audio", default="examples/driving_audios/1.wav")
    ap.add_argument("--steps-fast", type=int, default=15)
    ap.add_argument("--outdir", default="/tmp/hallo_lpips_samples")
    args = ap.parse_args()

    from hallo_tpu.utils.lpips import load_lpips, lpips_from_uint8

    lpips_params, lpips_status = load_lpips()
    skip = []
    if lpips_params is None:
        skip.append(lpips_status)
    # inference_process hard-exits (SystemExit) on any missing weight when
    # --allow-partial is unset, so gate on the specific files it needs, not
    # just the directory (a partially populated pretrained_models/ must still
    # produce the documented skip JSON + exit 0).
    required = (
        "pretrained_models/hallo/net.pth",
        "pretrained_models/wav2vec/wav2vec2-base-960h",
        "pretrained_models/sd-vae-ft-mse",
        "pretrained_models/stable-diffusion-v1-5",
        args.image,
        args.audio,
    )
    for path in required:
        if not os.path.exists(path):
            skip.append(f"missing {path}")
    if skip:
        print(json.dumps({
            "metric": "lpips_exact_vs_fast_samples",
            "skipped": "; ".join(skip),
        }))
        return

    import numpy as np

    from hallo_tpu.utils.video import read_frames
    from scripts.inference import inference_process

    os.makedirs(args.outdir, exist_ok=True)

    def render(profile, steps, out_name):
        ns = argparse.Namespace(
            config=args.config, source_image=args.image,
            driving_audio=args.audio,
            output=os.path.join(args.outdir, out_name),
            pose_weight=None, face_weight=None, lip_weight=None,
            face_expand_ratio=None, audio_ckpt_dir=None,
            profile=profile, inference_steps=steps,
        )
        return read_frames(inference_process(ns))

    try:
        exact = np.stack(render("exact", None, "exact.mp4"))
        fast = np.stack(render("fast", args.steps_fast, "fast.mp4"))
    except SystemExit as e:  # a weight the preflight missed — skip, not crash
        print(json.dumps({
            "metric": "lpips_exact_vs_fast_samples",
            "skipped": f"inference_process exited: {e}",
        }))
        return
    n = min(len(exact), len(fast))
    exact, fast = exact[:n], fast[:n]

    mse = np.mean((exact.astype(np.float64) - fast) ** 2)
    psnr = float(10 * np.log10(255.0 ** 2 / mse)) if mse > 0 else 99.0
    print(json.dumps({
        "metric": "lpips_exact_vs_fast_samples",
        "frames": int(n),
        "lpips": round(lpips_from_uint8(lpips_params, fast, exact), 4),
        "psnr_db": round(psnr, 2),
        "lpips_weights": lpips_status,
        "image": args.image,
        "audio": args.audio,
        "fast_profile": {"sampler": "dpm++2m", "steps": args.steps_fast,
                         "cfg_cache_stride": 3},
    }))


if __name__ == "__main__":
    main()
