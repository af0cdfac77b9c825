"""CLI inference: one portrait image + one WAV -> talking-head video.

The public product surface, argument-compatible with the reference
(scripts/inference.py:351-376):

    python scripts/inference.py --source_image X.jpg --driving_audio Y.wav \
        [--output out.mp4 --pose_weight 1.0 --face_weight 1.0 \
         --lip_weight 1.0 --face_expand_ratio 1.2 -c config.yaml]

Call stack (TPU-native version of SURVEY.md §3.1): host preprocessing
(face analysis, masks, audio embedding) -> converted weights -> ONE compiled
XLA program per clip (VAE encode refs -> ReferenceNet -> 40-step CFG denoise
-> batched VAE decode) -> sliding-window loop -> video writer.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
logger = logging.getLogger("hallo_tpu.inference")


# Named speed profiles (BASELINE.md speed/quality matrix; audited by
# scripts/eval_cache_quality.py — r4 matrix: unipc@12 dominates dpm++2m@15
# on PSNR/SSIM AND speed at every seed/size). Explicit --sampler /
# --step_cache / --cfg_cache_stride / --inference_steps flags win over the
# profile's defaults. Module-level so tests can pin the definitions.
PROFILE_DEFAULTS = {
    "exact": {},
    # UniPC (order-2 bh2) at 10 evals on the GRID-NESTED trailing schedule
    # (1000/10 spacing puts every knot exactly on the 40-step grid), NO
    # caching: the r5 512² matrix measured 29.31 dB mean vs exact at 3.44x
    # — higher PSNR/SSIM AND faster than r4's unipc@12+cfg-cache profile.
    # CFG-uncond caching was measured to cost 3-4 dB on nested grids
    # (it perturbs the multistep history), so the fast path runs pure.
    "fast": {"sampler": "unipc", "inference_steps": 10},
    # Nested-grid UniPC at 8 evals: 27.30 dB mean at 4.21x — dominates the
    # r4 turbo (dynamic-cache) definition on speed at comparable quality.
    "turbo": {"sampler": "unipc", "inference_steps": 8},
}


def inference_process(args: argparse.Namespace) -> str:
    import json
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hallo_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    t_start = time.perf_counter()

    from hallo_tpu import config as cfglib
    from hallo_tpu.config import (
        SchedulerConfig,
        unet_config_from_yaml_kwargs,
    )
    from hallo_tpu.convert.load_pretrained import (
        load_pretrained_params,
        load_wav2vec_params,
    )
    from hallo_tpu.data.audio_processor import AudioProcessor
    from hallo_tpu.data.image_processor import ImageProcessor
    from hallo_tpu.models.wav2vec import Wav2Vec2
    from hallo_tpu.pipelines.face_animate import (
        FaceAnimatePipeline,
        HalloModels,
        window_audio_embeddings,
    )
    from hallo_tpu.utils.factory import build_models

    config = cfglib.load_yaml(args.config)
    cli = {
        "source_image": args.source_image,
        "driving_audio": args.driving_audio,
        "pose_weight": args.pose_weight,
        "face_weight": args.face_weight,
        "lip_weight": args.lip_weight,
        "face_expand_ratio": args.face_expand_ratio,
        "audio_ckpt_dir": args.audio_ckpt_dir,
    }
    config = cfglib.merge_cli_overrides(config, cli)
    output = args.output or ".cache/output.mp4"

    width = config.data.source_image.width
    height = config.data.source_image.height
    clip_length = config.data.n_sample_frames
    n_motion = config.data.n_motion_frames
    dtype = jnp.bfloat16 if str(config.weight_dtype) in ("bf16", "fp16") else jnp.float32

    # ------------------------------------------------------------- image
    with timer.stage("image_preprocess"):
        img_proc = ImageProcessor(
            (width, height), config.face_analysis.model_path
        )
        processed = img_proc.preprocess(
            config.source_image, float(config.face_expand_ratio)
        )

    # ------------------------------------------------------------- models
    unet_kwargs = cfglib.to_container(config.unet_additional_kwargs)
    den_cfg = unet_config_from_yaml_kwargs(unet_kwargs)
    ref_cfg = unet_config_from_yaml_kwargs(
        unet_kwargs,
        use_motion_module=False,
        use_audio_module=False,
        use_inflated_groupnorm=False,
    )
    # Aux modules sized from the (possibly yaml-overridden) UNet config so a
    # shrunk unet_additional_kwargs yields a consistent end-to-end model
    # (face-locator channels = block 0; proj dims = cross/audio attn dims).
    from hallo_tpu.config import AudioProjConfig, FaceLocatorConfig, ImageProjConfig

    models = HalloModels.create(
        ref_cfg,
        den_cfg,
        params={},
        face_locator_config=FaceLocatorConfig(
            conditioning_embedding_channels=den_cfg.block_out_channels[0]
        ),
        image_proj_config=ImageProjConfig(
            cross_attention_dim=den_cfg.cross_attention_dim
        ),
        audio_proj_config=AudioProjConfig(output_dim=den_cfg.audio_attention_dim),
        dtype=dtype,
    )
    with timer.stage("init_params"):
        models.init_params(
            jax.random.PRNGKey(0),
            height=height,
            width=width,
            clip_length=clip_length,
            n_motion_frames=n_motion,
            param_dtype=dtype,
        )
    # A found-but-wrong-layout checkpoint must exit non-zero, not render
    # garbage (reference inference.py:250 asserts load completeness).
    allow_partial = bool(getattr(args, "allow_partial", False))
    timer_load = timer.stage("load_weights")
    timer_load.__enter__()
    models.params = load_pretrained_params(
        models.params,
        base_model_path=str(config.base_model_path),
        motion_module_path=str(config.motion_module_path),
        vae_model_path=str(config.vae.model_path),
        net_pth_path=os.path.join(str(config.audio_ckpt_dir), "net.pth"),
        min_loaded_fraction=0.0 if allow_partial else 0.99,
    )
    timer_load.__exit__(None, None, None)

    # ------------------------------------------------------------- audio
    from hallo_tpu.config import Wav2Vec2Config

    w2v_model = Wav2Vec2(Wav2Vec2Config())
    w2v_init = jax.jit(lambda k: w2v_model.init(k, jnp.zeros((1, 16000)), seq_len=25))(
        jax.random.PRNGKey(1)
    )
    try:
        w2v_params = load_wav2vec_params(str(config.wav2vec.model_path), w2v_init)
    except FileNotFoundError:
        # Same strictness as net.pth: random-init audio embeddings produce
        # garbage videos, so smoke mode must be opted into explicitly.
        if not allow_partial:
            raise SystemExit(
                f"wav2vec weights missing at {config.wav2vec.model_path!r}; "
                "pass --allow-partial to run in smoke mode with random init"
            )
        logger.warning("wav2vec weights missing; using random init (smoke mode)")
        w2v_params = w2v_init
    audio_proc = AudioProcessor(
        sample_rate=int(config.data.driving_audio.sample_rate),
        fps=int(config.data.export_video.fps),
        wav2vec_params=w2v_params,
        audio_separator_model_path=str(
            getattr(getattr(config, "audio_separator", None), "model_path", "")
        )
        or None,
        only_last_features=str(config.wav2vec.features) == "last",
    )
    with timer.stage("audio_preprocess"):
        # vocal separation (when the MDX model is present) + resample +
        # wav2vec forward — the reference's host-side audio path
        # (scripts/inference.py:118-186).
        audio_emb, audio_length = audio_proc.preprocess(
            str(config.driving_audio), clip_length
        )
        audio_windows = window_audio_embeddings(audio_emb, margin=2)

    # ------------------------------------------------------------ pipeline
    profile = getattr(args, "profile", None) or str(
        getattr(config, "profile", "") or ""
    ) or "exact"
    if profile not in PROFILE_DEFAULTS:
        raise SystemExit(f"--profile {profile!r}: expected exact|fast|turbo")
    prof = PROFILE_DEFAULTS[profile]

    sampler = (getattr(args, "sampler", None)
               or str(getattr(config, "sampler", "") or "")
               or prof.get("sampler", "ddim"))
    num_steps = int(
        getattr(args, "inference_steps", None)
        or prof.get("inference_steps", 0)
        or config.inference_steps
    )
    sched_kwargs = cfglib.to_container(config.noise_scheduler_kwargs)
    sched = SchedulerConfig(
        num_train_timesteps=int(sched_kwargs.get("num_train_timesteps", 1000)),
        beta_start=float(sched_kwargs["beta_start"]),
        beta_end=float(sched_kwargs["beta_end"]),
        beta_schedule=str(sched_kwargs["beta_schedule"]),
        prediction_type=str(sched_kwargs.get("prediction_type", "v_prediction")),
        rescale_betas_zero_snr=bool(config.enable_zero_snr),
        timestep_spacing=str(sched_kwargs.get("timestep_spacing", "trailing")),
    )
    pipe = FaceAnimatePipeline(
        models,
        sched,
        num_inference_steps=num_steps,
        guidance_scale=float(config.cfg_scale),
        clip_length=clip_length,
        n_motion_frames=n_motion,
        step_cache=(getattr(args, "step_cache", None)
                    or str(getattr(config, "step_cache", "") or "")
                    or prof.get("step_cache") or None),
        step_cache_threshold=float(
            getattr(config, "step_cache_threshold", 0.10) or 0.10
        ),
        cfg_cache_stride=int(
            getattr(args, "cfg_cache_stride", None)
            or getattr(config, "cfg_cache_stride", None)
            or prof.get("cfg_cache_stride", 1) or 1
        ),
        sampler=sampler,
        cfg_tail=int(
            getattr(args, "cfg_tail", None)
            if getattr(args, "cfg_tail", None) is not None
            else prof.get("cfg_tail", 0)
        ),
        timestep_schedule=(
            getattr(args, "timestep_schedule", None)
            or prof.get("timestep_schedule", "trailing")
        ),
        schedule_rho=float(
            getattr(args, "schedule_rho", None)
            or prof.get("schedule_rho", 1.0)
        ),
    )

    masks = tuple(
        (processed.full_masks[d], processed.face_masks[d], processed.lip_masks[d])
        for d in range(4)
    )
    # Stream each clip into the encoder as it is fetched: the cv2 encode of
    # clip c runs while clip c+1 denoises on-device (~2 s of host work in a
    # ~21 s device shadow at 512²), so "write_video" below is just the
    # close + audio mux instead of a serial full-video encode. Long-form
    # runs also stay O(clip) in host memory (return_video=False).
    from hallo_tpu.utils.video import StreamingVideoWriter  # noqa: local import keeps CLI start light

    vwriter = StreamingVideoWriter(
        output, fps=int(config.data.export_video.fps),
        audio_path=str(config.driving_audio),
    )
    try:
        with timer.stage("generate"):
            pipe(
                ref_image=processed.pixel_values[None],
                audio_windows=audio_windows,
                face_emb=processed.face_emb[None],
                face_region=processed.face_region[None],
                masks=masks,
                motion_scale=(
                    float(config.pose_weight),
                    float(config.face_weight),
                    float(config.lip_weight),
                ),
                seed=42,
                audio_length=audio_length,
                on_clip=lambda arr: vwriter.append(arr[0]),
                return_video=False,
            )
    finally:
        # Always close: flushes whatever clips landed (and cleans up the
        # .video.mp4 tmp) even if generation raised mid-run.
        with timer.stage("write_video"):
            vwriter.close()
    logger.info("wrote %s (%d frames)", output, vwriter.frames_written)

    timing_json = getattr(args, "timing_json", None)
    if timing_json:
        fps = int(config.data.export_video.fps)
        n_frames = int(vwriter.frames_written)
        total_s = time.perf_counter() - t_start
        out_seconds = n_frames / fps
        stages = {k: v["total_s"] for k, v in timer.summary().items()}
        report = {
            "metric": "e2e_inference",
            "profile": profile,
            "sampler": sampler,
            "steps": num_steps,
            "frames": n_frames,
            "fps": fps,
            "num_clips": -(-n_frames // clip_length),
            "stages_s": stages,
            "total_s": round(total_s, 3),
            "output_seconds": round(out_seconds, 3),
            # TRUE end-to-end rate: wall clock from process start to muxed
            # file, per second of output (bench.py reports the denoise+
            # decode-only compute_seconds_per_1s_output; this one includes
            # preprocessing, weight load, compile, and the video write).
            "seconds_per_1s_output": round(total_s / out_seconds, 3),
            "smoke_mode": allow_partial,
        }
        with open(timing_json, "w") as fh:
            json.dump(report, fh)
        logger.info("timing: %s", json.dumps(report))
    return output


def main() -> None:
    parser = argparse.ArgumentParser(description="hallo_tpu inference")
    parser.add_argument("-c", "--config", default="configs/inference/default.yaml")
    parser.add_argument("--source_image", type=str, default=None)
    parser.add_argument("--driving_audio", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--pose_weight", type=float, default=None)
    parser.add_argument("--face_weight", type=float, default=None)
    parser.add_argument("--lip_weight", type=float, default=None)
    parser.add_argument("--face_expand_ratio", type=float, default=None)
    parser.add_argument("--audio_ckpt_dir", "--checkpoint", type=str, default=None)
    parser.add_argument(
        "--allow-partial", dest="allow_partial", action="store_true",
        help="proceed even when found checkpoints load incompletely",
    )
    parser.add_argument(
        "--step_cache", type=str, default=None,
        choices=("uniform", "dynamic"),
        help="cached-prediction step skipping (~1.5-1.7x faster, small "
             "quality trade; hallo_tpu/diffusion/cache.py)")
    parser.add_argument(
        "--cfg_cache_stride", type=int, default=None,
        help="recompute the CFG-uncond half only every Nth step "
             "(adaptive-guidance caching; 1 = off)")
    parser.add_argument(
        "--cfg_tail", type=int, default=None,
        help="disable CFG entirely for the last N steps (guidance-interval "
             "truncation: cond-only evals, guidance weight 1.0)")
    parser.add_argument(
        "--timestep_schedule", type=str, default=None,
        choices=("trailing", "logsnr"),
        help="eval-grid spacing: trailing (reference parity) or logsnr "
             "(knots spaced in log-SNR — shrinks the order-1 warmup "
             "interval that dominates low-eval error)")
    parser.add_argument(
        "--schedule_rho", type=float, default=None,
        help="logsnr schedule curvature (1.0 uniform; >1 concentrates "
             "knots at the high-noise end)")
    parser.add_argument(
        "--sampler", type=str, default=None,
        choices=("ddim", "dpm++2m", "unipc"),
        help="solver for the denoise loop: ddim (reference parity), "
             "dpm++2m (second-order multistep; 15-20 evals ~ 40-step DDIM), "
             "or unipc (predictor-corrector; the fast/turbo profiles' "
             "solver — grid-nested 10 evals beats unipc@12+cfg-cache on "
             "PSNR/SSIM and speed)")
    parser.add_argument(
        "--inference_steps", type=int, default=None,
        help="override the config's denoise step count")
    parser.add_argument(
        "--timing_json", type=str, default=None,
        help="write a JSON stage-timing breakdown (preprocess / weights / "
             "generate / write and true end-to-end seconds per 1s of output) "
             "to this path")
    parser.add_argument(
        "--profile", type=str, default=None,
        choices=("exact", "fast", "turbo"),
        help="named speed profile: exact (default), fast (unipc @ 10 "
             "grid-nested evals — 29.3 dB vs exact at 3.4x), or turbo "
             "(unipc @ 8 — 27.3 dB at 4.2x; BASELINE.md r5 matrix)")
    inference_process(parser.parse_args())


if __name__ == "__main__":
    main()
