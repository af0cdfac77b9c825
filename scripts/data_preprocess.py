"""Two-pass dataset builder.

Reference: scripts/data_preprocess.py:33-191. Step 1 (CPU): decode frames at
25 fps, extract audio, compute union face/lip masks. Step 2 (accelerated):
identity embedding + wav2vec audio embedding. Results are packed into one
.npz per clip (instead of scattered PNG/pt files) consumed by
hallo_tpu.data.datasets; use -p/-r for embarrassingly-parallel sharding of
the video list across processes (reference :148-162)."""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("hallo_tpu.preprocess")


def process_single_video(video_path: str, out_dir: str, step: int, args) -> dict:
    import cv2

    from hallo_tpu.data.image_processor import ImageProcessorForDataProcessing
    from hallo_tpu.utils import masks as mk
    from hallo_tpu.utils.video import extract_audio, read_frames

    name = Path(video_path).stem
    npz_path = os.path.join(out_dir, f"{name}.npz")
    partial = dict(np.load(npz_path)) if os.path.exists(npz_path) else {}

    if step == 1:
        frames = read_frames(video_path)
        proc = ImageProcessorForDataProcessing(args.face_analysis_model_path, step=1)
        face_union, full_m, sep_face_m, sep_lip_m = proc.union_masks(frames)
        h, w = frames[0].shape[:2]
        size = min(h, w)
        partial["frames"] = np.stack(
            [cv2.resize(f, (args.size, args.size)) for f in frames]
        ).astype(np.uint8)
        region = cv2.resize(face_union, (args.size, args.size))
        partial["face_region"] = np.repeat(
            (region.astype(np.float32) / 255.0)[..., None], 3, axis=-1
        )
        for level, scale in enumerate((8, 16, 32, 64)):
            for kind, mask in (("full", full_m), ("face", sep_face_m), ("lip", sep_lip_m)):
                partial[f"{kind}_mask_{level}"] = mk.mask_pyramid(
                    mask, args.size, (scale,)
                )[0]
        try:
            wav = os.path.join(out_dir, f"{name}.wav")
            extract_audio(video_path, wav, 16000)
            partial["audio_path"] = np.asarray(wav)
        except Exception as e:
            logger.warning("audio extraction failed for %s: %s", name, e)

    if step == 2:
        from hallo_tpu.data.audio_processor import AudioProcessor
        from hallo_tpu.data.image_processor import ImageProcessorForDataProcessing

        proc = ImageProcessorForDataProcessing(args.face_analysis_model_path, step=2)
        frames = [f for f in partial["frames"]]
        partial["face_emb"] = proc.face_embedding(frames)
        wav = str(partial.get("audio_path", ""))
        if wav and os.path.exists(wav):
            import jax

            from hallo_tpu.config import Wav2Vec2Config
            from hallo_tpu.convert.load_pretrained import load_wav2vec_params
            from hallo_tpu.models.wav2vec import Wav2Vec2

            model = Wav2Vec2(Wav2Vec2Config())
            init = model.init(
                jax.random.PRNGKey(0), np.zeros((1, 16000), np.float32), seq_len=25
            )
            try:
                params = load_wav2vec_params(args.wav2vec_model_path, init)
            except FileNotFoundError:
                logger.warning(
                    "wav2vec weights missing; using random init (smoke mode)"
                )
                params = init
            ap = AudioProcessor(wav2vec_params=params)
            emb, _ = ap.preprocess(wav)
            partial["audio_emb"] = emb

    np.savez_compressed(npz_path, **partial)
    return {"clip_path": npz_path}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input_dir", required=True)
    parser.add_argument("-o", "--output_dir", default="./data/clips")
    parser.add_argument("-s", "--step", type=int, default=1, choices=(1, 2))
    parser.add_argument("-p", type=int, default=1, help="parallelism degree")
    parser.add_argument("-r", type=int, default=0, help="rank for modulo sharding")
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--face_analysis_model_path",
                        default="./pretrained_models/face_analysis")
    parser.add_argument("--wav2vec_model_path",
                        default="./pretrained_models/wav2vec/wav2vec2-base-960h")
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    videos = sorted(
        str(p) for p in Path(args.input_dir).glob("**/*")
        if p.suffix.lower() in (".mp4", ".avi", ".mov", ".mkv")
    )
    videos = [v for i, v in enumerate(videos) if i % args.p == args.r]
    logger.info("processing %d videos (step %d)", len(videos), args.step)

    meta = []
    for video in videos:
        try:
            meta.append(process_single_video(video, args.output_dir, args.step, args))
        except Exception as e:  # skip failed videos (reference :112-113)
            logger.warning("failed %s: %s", video, e)

    if args.step == 2:
        meta_path = os.path.join(
            os.path.dirname(args.output_dir) or ".", f"dataset_stage2_r{args.r}.json"
        )
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)
        logger.info("wrote %s (%d clips)", meta_path, len(meta))


if __name__ == "__main__":
    main()
