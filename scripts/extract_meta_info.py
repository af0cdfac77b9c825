"""Emit stage-1/stage-2 meta JSON from preprocessed clips.

Reference: scripts/extract_meta_info_stage1.py + _stage2.py (one script with
--stage here: the .npz clip format makes both stages' fields co-located).
Validates frame-vs-audio length agreement within +-3 frames
(extract_meta_info_stage2.py:128-132)."""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--clips_dir", required=True)
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--stage", type=int, default=2, choices=(1, 2))
    args = parser.parse_args()

    meta = []
    for npz in sorted(Path(args.clips_dir).glob("*.npz")):
        data = np.load(npz)
        entry = {"clip_path": str(npz)}
        if "frames" not in data or "face_emb" not in data:
            print(f"skip {npz.name}: missing frames/face_emb")
            continue
        if args.stage == 2:
            if "audio_emb" not in data:
                print(f"skip {npz.name}: no audio embedding")
                continue
            n_frames, n_audio = len(data["frames"]), len(data["audio_emb"])
            if abs(n_frames - n_audio) > 3:
                print(f"skip {npz.name}: frames {n_frames} vs audio {n_audio}")
                continue
        meta.append(entry)

    out = args.output or f"./data/dataset_stage{args.stage}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {out} ({len(meta)} clips)")


if __name__ == "__main__":
    main()
