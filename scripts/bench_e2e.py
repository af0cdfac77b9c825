"""End-to-end product benchmark: scripts/inference.py timed as a whole.

BASELINE.json's north-star metric is "end-to-end seconds per 1 s of output";
bench.py measures the clip COMPUTE only (denoise + decode, steady state).
This script times the product the way a user runs it — face analysis,
weight load, audio preprocessing (separation + wav2vec), the jitted clip
program including its compile, and the video write — and prints ONE JSON
line with the stage breakdown (reference host path:
/root/reference/scripts/inference.py:118-348).

Default assets are the reference's own examples (media inputs, not code);
override with HALLO_E2E_IMAGE / HALLO_E2E_AUDIO. Runs in --allow-partial
smoke mode when pretrained weights are absent in the environment (the env
has none); compute shapes and therefore timings are identical to the
weighted run except that insightface/mdx fall back to their documented
host-side substitutes (flagged in the output as smoke_mode).

Run ONLY on the TPU holder (one process per chip), never concurrently with
bench.py.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=os.environ.get(
        "HALLO_E2E_IMAGE", "/root/reference/examples/reference_images/1.jpg"))
    ap.add_argument("--audio", default=os.environ.get(
        "HALLO_E2E_AUDIO", "/root/reference/examples/driving_audios/1.wav"))
    ap.add_argument("-c", "--config", default="configs/inference/default.yaml")
    ap.add_argument("--profile", default=os.environ.get("HALLO_E2E_PROFILE", "exact"))
    ap.add_argument("--max_seconds_audio", type=float, default=float(
        os.environ.get("HALLO_E2E_MAX_AUDIO_S", "0")),
        help="trim the driving audio to this many seconds (0 = full)")
    args = ap.parse_args()

    if not os.path.exists(args.image) or not os.path.exists(args.audio):
        print(json.dumps({
            "metric": "e2e_inference", "skipped": True,
            "reason": f"assets missing: {args.image} / {args.audio}",
        }))
        return

    audio_path = args.audio
    tmpdir = tempfile.mkdtemp(prefix="hallo_e2e_")
    if args.max_seconds_audio > 0:
        # Trim on the host (pure-python WAV slice) so the bench length is
        # controllable without ffmpeg.
        import wave

        with wave.open(args.audio, "rb") as r:
            params = r.getparams()
            n = min(r.getnframes(),
                    int(args.max_seconds_audio * params.framerate))
            frames = r.readframes(n)
        audio_path = os.path.join(tmpdir, "trimmed.wav")
        with wave.open(audio_path, "wb") as w:
            w.setparams(params)
            w.writeframes(frames)

    out = os.path.join(tmpdir, "out.mp4")
    timing = os.path.join(tmpdir, "timing.json")

    from scripts.inference import inference_process

    ns = argparse.Namespace(
        config=args.config, source_image=args.image, driving_audio=audio_path,
        output=out, pose_weight=None, face_weight=None, lip_weight=None,
        face_expand_ratio=None, audio_ckpt_dir=None, allow_partial=True,
        step_cache=None, cfg_cache_stride=None, sampler=None,
        inference_steps=None, profile=args.profile, timing_json=timing,
    )
    inference_process(ns)

    with open(timing) as fh:
        report = json.load(fh)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
