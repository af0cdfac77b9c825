"""Generate the wav2vec2-base-960h key+shape inventory JSON.

The inventory is produced from transformers' own Wav2Vec2Model at the base
config — the same class the reference wraps (hallo/models/wav2vec.py:21) —
so its key list IS the published checkpoint's, modulo the weight-norm
naming: the published pytorch_model.bin stores the positional conv as
`weight_g`/`weight_v` (pre-parametrization torch), while a fresh torch>=2
instantiation exposes `parametrizations.weight.original{0,1}`. We record
the published names (the converter handles both, torch_to_jax.py:423-443).

Run: python scripts/gen_wav2vec_inventory.py  (rewrites the frozen JSON)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch
from transformers import Wav2Vec2Config, Wav2Vec2Model

OUT = os.path.join(
    os.path.dirname(__file__), "..", "hallo_tpu", "convert",
    "wav2vec2_base_inventory.json",
)


def main() -> None:
    cfg = Wav2Vec2Config()  # defaults == facebook/wav2vec2-base(-960h)
    try:
        with torch.device("meta"):
            model = Wav2Vec2Model(cfg)
    except Exception:
        model = Wav2Vec2Model(cfg)

    inv = {}
    sd = model.state_dict()
    for key, t in sd.items():
        key = key.replace(
            "pos_conv_embed.conv.parametrizations.weight.original0",
            "pos_conv_embed.conv.weight_g",
        ).replace(
            "pos_conv_embed.conv.parametrizations.weight.original1",
            "pos_conv_embed.conv.weight_v",
        )
        inv[key] = list(t.shape)
    # published base-960h file has no adapter/quantizer heads; the bare
    # Wav2Vec2Model state dict already matches (masked_spec_embed included)
    with open(os.path.abspath(OUT), "w") as f:
        json.dump(inv, f, indent=0, sort_keys=True)
    print(f"wrote {len(inv)} keys -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
