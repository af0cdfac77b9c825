"""Preflight for a weights-present host (BASELINE.md RUNBOOK step 1).

For each production checkpoint under `pretrained_models/`, verifies the
file's ACTUAL key+shape set against the frozen inventory contract
(hallo_tpu/convert/weight_inventory.py) — a stronger integrity gate than a
hash: it proves the file is the artifact the converter was built for, key
by key, and names any drift (a renamed diffusers key, a truncated
download) before an expensive render is attempted.

Without weights it prints per-asset "missing" and exits 0 (the documented
skip convention); with weights, exit 1 on any mismatch.

Usage: python scripts/preflight_weights.py [--root pretrained_models]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(inventory, state_dict, ignore_prefixes=()):
    """Compare a loaded state dict against an inventory. Returns issue list."""
    issues = []
    sd_keys = {
        k: tuple(v.shape) for k, v in state_dict.items()
        if not any(k.startswith(p) for p in ignore_prefixes)
    }
    for k, shape in inventory.items():
        if k not in sd_keys:
            issues.append(f"checkpoint missing key: {k}")
        elif sd_keys[k] != tuple(shape):
            issues.append(
                f"shape drift at {k}: file {sd_keys[k]} vs contract {tuple(shape)}"
            )
    for k in sd_keys:
        if k not in inventory:
            issues.append(f"unexpected key in file: {k}")
    return issues


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="pretrained_models")
    args = ap.parse_args()

    from hallo_tpu.convert import torch_to_jax as cv
    from hallo_tpu.convert import weight_inventory as wi

    assets = [
        (
            "sd15_unet",
            os.path.join(
                args.root, "stable-diffusion-v1-5", "unet",
                "diffusion_pytorch_model.safetensors",
            ),
            wi.sd15_unet_inventory,
            (),
        ),
        (
            "sd_vae_ft_mse",
            os.path.join(
                args.root, "sd-vae-ft-mse", "diffusion_pytorch_model.safetensors"
            ),
            wi.sd_vae_inventory,
            (),
        ),
        (
            "animatediff_mm",
            os.path.join(args.root, "motion_module", "mm_sd_v15_v2.ckpt"),
            wi.animatediff_mm_inventory,
            (),
        ),
        (
            "net_pth",
            os.path.join(args.root, "hallo", "net.pth"),
            wi.net_pth_inventory,
            (),
        ),
        (
            "wav2vec2",
            next(
                (
                    p
                    for p in (
                        os.path.join(args.root, "wav2vec",
                                     "wav2vec2-base-960h", "model.safetensors"),
                        os.path.join(args.root, "wav2vec",
                                     "wav2vec2-base-960h", "pytorch_model.bin"),
                    )
                    if os.path.exists(p)
                ),
                os.path.join(args.root, "wav2vec", "wav2vec2-base-960h",
                             "model.safetensors"),
            ),
            wi.wav2vec2_inventory,
            # published file may carry lm_head etc. when saved from the CTC
            # model; the converter skips them
            ("lm_head.",),
        ),
    ]

    report = {}
    failed = False
    for name, path, inv_fn, ignore in assets:
        if not os.path.exists(path):
            report[name] = {"status": "missing", "path": path}
            continue
        try:
            if path.endswith(".safetensors"):
                sd = cv.load_safetensors(path)
            else:
                sd = cv.load_torch_checkpoint(path)
            if name == "wav2vec2":
                # published base-960h ships the ForCTC wrapper: strip the
                # wav2vec2. prefix, ignore the CTC head; newer torch
                # re-exports rename the weight-normed pos_conv params
                sd = {
                    k.removeprefix("wav2vec2.")
                    .replace("pos_conv_embed.conv.parametrizations.weight."
                             "original0", "pos_conv_embed.conv.weight_g")
                    .replace("pos_conv_embed.conv.parametrizations.weight."
                             "original1", "pos_conv_embed.conv.weight_v"): v
                    for k, v in sd.items()
                }
            issues = check(inv_fn(), sd, ignore)
        except Exception as e:  # noqa: BLE001 — report, don't crash preflight
            issues = [f"load error: {e!r}"]
        if issues:
            failed = True
            report[name] = {"status": "FAIL", "path": path,
                            "issues": issues[:20],
                            "issue_count": len(issues)}
        else:
            report[name] = {"status": "ok", "path": path,
                            "keys": len(inv_fn())}
    print(json.dumps({"metric": "weights_preflight", "assets": report},
                     indent=1))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
