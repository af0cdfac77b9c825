"""Load the reference's pretrained-model layout into hallo_tpu params.

Mirrors scripts/inference.py:184-251: SD-1.5 UNet (ReferenceNet + the 2D
half of the denoiser), AnimateDiff motion module, sd-vae-ft-mse,
wav2vec2-base-960h, then hallo's fused net.pth overriding the five modules.
Expected directory layout = the reference's `pretrained_models/`
(README.md:150-185)."""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

from hallo_tpu.convert import torch_to_jax as cv

logger = logging.getLogger(__name__)


def _find_unet_weights(base_model_path: str) -> Optional[str]:
    for name in (
        "unet/diffusion_pytorch_model.safetensors",
        "unet/diffusion_pytorch_model.bin",
    ):
        path = os.path.join(base_model_path, name)
        if os.path.exists(path):
            return path
    return None


def _find_vae_weights(vae_path: str) -> Optional[str]:
    for name in ("diffusion_pytorch_model.safetensors", "diffusion_pytorch_model.bin"):
        path = os.path.join(vae_path, name)
        if os.path.exists(path):
            return path
    return None


def _load_any(path: str) -> Dict[str, Any]:
    if path.endswith(".safetensors"):
        return cv.load_safetensors(path)
    return cv.load_torch_checkpoint(path)


def load_pretrained_params(
    init_params: Dict[str, Any],
    base_model_path: Optional[str] = None,
    motion_module_path: Optional[str] = None,
    vae_model_path: Optional[str] = None,
    net_pth_path: Optional[str] = None,
    strict: bool = False,
    min_loaded_fraction: float = 0.0,
) -> Dict[str, Any]:
    """Overlay all available pretrained weights onto random-init params.

    Returns the updated params dict; logs a per-module load report. Missing
    files are skipped with a warning (smoke runs proceed on random init).

    `min_loaded_fraction` guards against silently half-loaded checkpoints
    (the reference asserts load completeness, inference.py:250): any module
    for which a checkpoint WAS found must end up with at least this fraction
    of its parameters loaded, else RuntimeError. Trainers keep 0.0 (partial
    init from SD/AnimateDiff is the normal starting point); the inference
    CLI passes ~1.0 unless --allow-partial."""
    params = dict(init_params)
    reports: Dict[str, Dict[str, Any]] = {}

    unet_sd = None
    if base_model_path:
        unet_file = _find_unet_weights(base_model_path)
        if unet_file:
            unet_sd = _load_any(unet_file)
        else:
            logger.warning("no SD-1.5 UNet weights under %s", base_model_path)

    motion_sd = None
    if motion_module_path and os.path.exists(motion_module_path):
        motion_sd = cv.load_torch_checkpoint(motion_module_path)

    net_groups = None
    if net_pth_path and os.path.exists(net_pth_path):
        net_groups = cv.split_net_pth(cv.load_torch_checkpoint(net_pth_path))

    # --- VAE ---
    if vae_model_path:
        vae_file = _find_vae_weights(vae_model_path)
        if vae_file:
            params["vae"], report = cv.convert_vae(
                _load_any(vae_file), params["vae"], strict=strict
            )
            _log("vae", report)
            reports["vae"] = report

    # --- ReferenceNet: SD-1.5, then net.pth override ---
    ref_sds = [sd for sd in (unet_sd,) if sd is not None]
    if net_groups and net_groups["reference_unet"]:
        ref_sds.append(net_groups["reference_unet"])
    if ref_sds:
        merged: Dict = {}
        for sd in ref_sds:
            merged.update(sd)
        params["reference_net"], report = cv.convert_reference_unet(
            merged, params["reference_net"], strict=False
        )
        _log("reference_net", report)
        reports["reference_net"] = report

    # --- Denoising UNet: SD-1.5 + AnimateDiff + net.pth (later wins),
    #     shape-mismatch tolerant (from_pretrained_2d, unet_3d.py:776-830) ---
    den_sds = [sd for sd in (unet_sd, motion_sd) if sd is not None]
    if net_groups and net_groups["denoising_unet"]:
        den_sds.append(net_groups["denoising_unet"])
    if den_sds:
        params["denoising_net"], report = cv.convert_denoising_unet(
            den_sds, params["denoising_net"], strict=False
        )
        _log("denoising_net", report)
        reports["denoising_net"] = report

    # --- small heads from net.pth ---
    if net_groups:
        if net_groups["face_locator"]:
            params["face_locator"], report = cv.convert_face_locator(
                net_groups["face_locator"], params["face_locator"], strict=strict
            )
            _log("face_locator", report)
            reports["face_locator"] = report
        if net_groups["imageproj"]:
            params["image_proj"], report = cv.convert_image_proj(
                net_groups["imageproj"], params["image_proj"], strict=strict
            )
            _log("image_proj", report)
            reports["image_proj"] = report
        if net_groups["audioproj"]:
            params["audio_proj"], report = cv.convert_audio_proj(
                net_groups["audioproj"], params["audio_proj"], strict=strict
            )
            _log("audio_proj", report)
            reports["audio_proj"] = report

    if min_loaded_fraction > 0.0:
        check_load_completeness(reports, min_loaded_fraction)
    return params


def check_load_completeness(
    reports: Dict[str, Dict[str, Any]], min_loaded_fraction: float
) -> None:
    """Fail when any module with a found checkpoint loaded below the
    threshold — a wrong-layout checkpoint must not produce garbage with
    rc=0 (reference inference.py:250 load-completeness assert)."""
    failures = []
    for name, report in reports.items():
        loaded = len(report["loaded"])
        total = loaded + len(report["missing_in_ckpt"]) + len(report["shape_mismatch"])
        frac = loaded / max(total, 1)
        if frac < min_loaded_fraction:
            sample = (report["shape_mismatch"] + report["missing_in_ckpt"])[:5]
            failures.append(
                f"{name}: loaded {loaded}/{total} ({frac:.1%}) — e.g. {sample}"
            )
    if failures:
        raise RuntimeError(
            "checkpoint load incomplete (pass --allow-partial to override):\n  "
            + "\n  ".join(failures)
        )


def load_wav2vec_params(model_path: str, init_params: Any, strict: bool = True):
    """wav2vec2-base-960h HF dir -> Wav2Vec2 params."""
    for name in ("model.safetensors", "pytorch_model.bin"):
        path = os.path.join(model_path, name)
        if os.path.exists(path):
            sd = _load_any(path)
            params, report = cv.convert_wav2vec(sd, init_params, strict=strict)
            _log("wav2vec", report)
            return params
    raise FileNotFoundError(f"no wav2vec weights under {model_path}")


def _log(name: str, report: Dict[str, Any]) -> None:
    logger.info(
        "%s: loaded=%d missing=%d mismatched=%d unused=%d unmapped=%d",
        name,
        len(report["loaded"]),
        len(report["missing_in_ckpt"]),
        len(report["shape_mismatch"]),
        len(report["unused_ckpt"]),
        len(report.get("unmapped_ckpt_keys", [])),
    )
    for key in report["shape_mismatch"][:8]:
        logger.warning("%s: shape mismatch (kept random init): %s", name, key)
