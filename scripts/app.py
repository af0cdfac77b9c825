"""Web demo wrapping the inference pipeline (reference scripts/app.py:18-51).

Uses gradio when installed; otherwise serves a minimal stdlib HTTP form —
same knobs either way (source image, driving audio, pose/face/lip weights)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def predict(image_path, audio_path, pose_weight, face_weight, lip_weight,
            profile="exact", progress=None):
    from types import SimpleNamespace

    from scripts.inference import inference_process

    args = SimpleNamespace(
        config="configs/inference/default.yaml",
        source_image=image_path,
        driving_audio=audio_path,
        output=".cache/output.mp4",
        pose_weight=pose_weight,
        face_weight=face_weight,
        lip_weight=lip_weight,
        face_expand_ratio=1.2,
        audio_ckpt_dir=None,
        profile=profile or "exact",
    )
    return inference_process(args)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()
    try:
        import gradio as gr

        iface = gr.Interface(
            fn=predict,
            inputs=[
                gr.Image(label="source image (portrait, square)", type="filepath"),
                gr.Audio(label="driving audio (WAV)", type="filepath"),
                gr.Number(label="pose weight", value=1.0),
                gr.Number(label="face weight", value=1.0),
                gr.Number(label="lip weight", value=1.0),
                gr.Dropdown(
                    label="speed profile",
                    choices=["exact", "fast", "turbo"],
                    value="exact",
                    info="fast = UniPC @ 10 grid-nested evals (29.3 dB vs "
                         "exact, 3.4x); turbo = UniPC @ 8 (27.3 dB, 4.2x) "
                         "(speed/quality audit in BASELINE.md)",
                ),
            ],
            outputs=[gr.Video()],
            title="hallo_tpu — audio-driven portrait animation",
        )
        iface.launch(server_port=args.port)
    except ImportError:
        _serve_minimal(args.port)


def _serve_minimal(port: int) -> None:
    """Stdlib fallback UI: upload form -> video file response."""
    import email
    import email.policy
    import http.server
    import tempfile

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(
                b"<html><body><h2>hallo_tpu</h2>"
                b"<form method=post enctype=multipart/form-data>"
                b"image <input type=file name=image><br>"
                b"audio <input type=file name=audio><br>"
                b"<input type=submit value=Animate></form></body></html>"
            )

        def do_POST(self):
            # Parse the multipart body with the email package (the cgi module
            # was removed in Python 3.13).
            length = int(self.headers.get("Content-Length", 0))
            raw = (
                f"Content-Type: {self.headers['Content-Type']}\r\n\r\n".encode()
                + self.rfile.read(length)
            )
            msg = email.message_from_bytes(raw, policy=email.policy.HTTP)
            parts = {
                p.get_param("name", header="content-disposition"): p.get_payload(
                    decode=True
                )
                for p in msg.iter_parts()
            }
            with tempfile.TemporaryDirectory() as tmp:
                img = os.path.join(tmp, "image.jpg")
                wav = os.path.join(tmp, "audio.wav")
                open(img, "wb").write(parts["image"])
                open(wav, "wb").write(parts["audio"])
                out = predict(img, wav, 1.0, 1.0, 1.0)
            self.send_response(200)
            self.send_header("Content-Type", "video/mp4")
            self.end_headers()
            self.wfile.write(open(out, "rb").read())

    print(f"serving minimal UI on :{port} (gradio not installed)")
    http.server.HTTPServer(("0.0.0.0", port), Handler).serve_forever()


if __name__ == "__main__":
    main()
