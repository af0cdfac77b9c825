"""StreamingVideoWriter: incremental encode == one-shot write_video.

The writer backs FaceAnimatePipeline's `on_clip` hook (encode hides behind
device time; long-form stays O(clip) in host memory) — reference equivalent
is the buffered util.py:297-321 tensor_to_video.
"""

import numpy as np

from hallo_tpu.utils.video import StreamingVideoWriter, read_frames, write_video


def test_streaming_writer_matches_one_shot(tmp_path):
    rng = np.random.default_rng(0)
    clip_a = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    clip_b = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)  # float path

    stream_path = str(tmp_path / "stream.mp4")
    w = StreamingVideoWriter(stream_path, fps=25)
    w.append(clip_a)
    w.append(clip_b)
    out = w.close()
    assert out == stream_path and w.frames_written == 7

    one_shot = str(tmp_path / "oneshot.mp4")
    full = np.concatenate(
        [clip_a, (np.clip(clip_b, 0, 1) * 255).astype(np.uint8)], axis=0
    )
    write_video(full, one_shot, fps=25)

    fs = read_frames(stream_path)
    fo = read_frames(one_shot)
    assert len(fs) == len(fo) == 7
    np.testing.assert_array_equal(np.stack(fs), np.stack(fo))


def test_streaming_writer_missing_audio_mux_fallback(tmp_path, caplog):
    # No ffmpeg in this env: the writer must still deliver the video file
    # (same gated fallback as write_video).
    wav = tmp_path / "a.wav"
    wav.write_bytes(b"RIFF0000WAVE")  # never parsed when ffmpeg is absent
    path = str(tmp_path / "muxed.mp4")
    w = StreamingVideoWriter(path, fps=25, audio_path=str(wav))
    w.append(np.zeros((2, 16, 16, 3), np.uint8))
    import shutil

    out = w.close()
    if shutil.which("ffmpeg") is None:
        assert out == path
        assert len(read_frames(path)) == 2
    else:  # pragma: no cover - env has no ffmpeg today
        assert len(read_frames(out)) >= 1
