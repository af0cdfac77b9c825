"""PyTorch checkpoint -> flax param pytree converters.

Replicates the reference's pretrained ingestion (SURVEY.md §5):
- SD-1.5 UNet (diffusers layout) -> ReferenceNet / DenoisingUNet spatial
  weights
- AnimateDiff mm_sd_v15_v2.ckpt -> motion modules, merged with
  shape-mismatch tolerance like `from_pretrained_2d` (unet_3d.py:776-830)
- sd-vae-ft-mse -> AutoencoderKL
- wav2vec2-base-960h (HF) -> Wav2Vec2
- hallo net.pth (fused Net state dict, scripts/inference.py:244-250) ->
  all five module trees

Layout transforms: torch Conv2d OIHW -> flax HWIO; Conv1d OIK -> KIO;
Linear (out,in) -> (in,out); 1x1 convs used as per-token linears -> Dense.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

FlaxPath = Tuple[str, ...]
Entry = Tuple[FlaxPath, np.ndarray]


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def t_conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def t_conv1d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))  # OIK -> KIO


def t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)  # (out,in) -> (in,out)


def t_conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, 0, 0])  # (O,I,1,1) -> (I,O)


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


# ---------------------------------------------------------------------------
# shared sub-module mappers
# ---------------------------------------------------------------------------


def _map_norm(rest: str, base: FlaxPath) -> Optional[Entry]:
    kind = "scale" if rest == "weight" else "bias"
    return base + (kind,), None


def _map_conv(rest: str, base: FlaxPath) -> Optional[Tuple[FlaxPath, Optional[Callable]]]:
    if rest == "weight":
        return base + ("Conv_0", "kernel"), t_conv2d
    return base + ("Conv_0", "bias"), None


def _map_dense(rest: str, base: FlaxPath) -> Tuple[FlaxPath, Optional[Callable]]:
    if rest == "weight":
        return base + ("Dense_0", "kernel"), t_linear
    return base + ("Dense_0", "bias"), None


def _map_proj_1x1(rest: str, base: FlaxPath) -> Tuple[FlaxPath, Optional[Callable]]:
    """SD's proj_in/proj_out/zero_conv are Conv2d(1x1); ours are Dense."""
    if rest == "weight":
        return base + ("Dense_0", "kernel"), t_conv1x1_to_dense
    return base + ("Dense_0", "bias"), None


def _map_resnet(rest: str, base: FlaxPath):
    m = re.match(r"(norm1|norm2)\.(weight|bias)$", rest)
    if m:
        return _map_norm(m.group(2), base + (m.group(1),))
    m = re.match(r"(conv1|conv2|conv_shortcut)\.(weight|bias)$", rest)
    if m:
        return _map_conv(m.group(2), base + (m.group(1),))
    m = re.match(r"time_emb_proj\.(weight|bias)$", rest)
    if m:
        return _map_dense(m.group(1), base + ("time_emb_proj",))
    return None


def _map_attention(rest: str, base: FlaxPath):
    """diffusers Attention: to_q/to_k/to_v (no bias), to_out.0."""
    m = re.match(r"(to_q|to_k|to_v)\.(weight|bias)$", rest)
    if m:
        return _map_dense(m.group(2), base + (m.group(1),))
    m = re.match(r"to_out\.0\.(weight|bias)$", rest)
    if m:
        return _map_dense(m.group(1), base + ("to_out",))
    return None


def _map_ff(rest: str, base: FlaxPath):
    m = re.match(r"net\.0\.proj\.(weight|bias)$", rest)
    if m:
        return _map_dense(m.group(1), base + ("proj_in",))
    m = re.match(r"net\.2\.(weight|bias)$", rest)
    if m:
        return _map_dense(m.group(1), base + ("proj_out",))
    return None


def _map_transformer_block(rest: str, base: FlaxPath):
    """BasicTransformerBlock / TemporalBasicTransformerBlock /
    AudioTemporalBasicTransformerBlock internals."""
    m = re.match(r"(norm1|norm2|norm3)\.(weight|bias)$", rest)
    if m:
        return _map_norm(m.group(2), base + (m.group(1),))
    m = re.match(r"(attn1|attn2|attn2_0|attn2_1|attn2_2)\.(.+)$", rest)
    if m:
        return _map_attention(m.group(2), base + (m.group(1),))
    m = re.match(r"(zero_conv_full|zero_conv_face|zero_conv_lip)\.(weight|bias)$", rest)
    if m:
        return _map_proj_1x1(m.group(2), base + (m.group(1),))
    m = re.match(r"ff\.(.+)$", rest)
    if m:
        return _map_ff(m.group(1), base + ("ff",))
    return None


def _map_spatial_transformer(rest: str, base: FlaxPath):
    """Transformer2D/3D wrapper: norm, proj_in/out (1x1 conv), blocks."""
    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        return _map_norm(m.group(1), base + ("norm",))
    m = re.match(r"(proj_in|proj_out)\.(weight|bias)$", rest)
    if m:
        return _map_proj_1x1(m.group(2), base + (m.group(1),))
    m = re.match(r"transformer_blocks\.(\d+)\.(.+)$", rest)
    if m:
        return _map_transformer_block(m.group(2), base + (f"blocks_{m.group(1)}",))
    return None


def _map_motion_module(rest: str, base: FlaxPath):
    """VanillaTemporalModule.temporal_transformer internals
    (motion_module.py:200-316)."""
    rest = rest.removeprefix("temporal_transformer.")
    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        return _map_norm(m.group(1), base + ("norm",))
    m = re.match(r"(proj_in|proj_out)\.(weight|bias)$", rest)
    if m:
        return _map_dense(m.group(2), base + (m.group(1),))
    m = re.match(r"transformer_blocks\.(\d+)\.attention_blocks\.(\d+)\.(.+)$", rest)
    if m:
        k, a, inner = m.groups()
        if "pos_encoder" in inner:
            return "skip"
        return _map_attention(inner, base + (f"blocks_{k}_attn_{a}", "attn"))
    m = re.match(r"transformer_blocks\.(\d+)\.norms\.(\d+)\.(weight|bias)$", rest)
    if m:
        return _map_norm(m.group(3), base + (f"blocks_{m.group(1)}_norm_{m.group(2)}",))
    m = re.match(r"transformer_blocks\.(\d+)\.ff\.(.+)$", rest)
    if m:
        return _map_ff(m.group(2), base + (f"blocks_{m.group(1)}_ff",))
    m = re.match(r"transformer_blocks\.(\d+)\.ff_norm\.(weight|bias)$", rest)
    if m:
        return _map_norm(m.group(2), base + (f"blocks_{m.group(1)}_ff_norm",))
    return None


# ---------------------------------------------------------------------------
# UNet mappers ("flavor": reference = flat names, denoise = nested names)
# ---------------------------------------------------------------------------


def map_unet_key(key: str, flavor: str):
    """torch diffusers-style UNet key -> (flax path, transform) or 'skip'."""
    assert flavor in ("reference", "denoise")
    flat = flavor == "reference"

    def block_base(kind: str, i: str, sub: str, j: str) -> FlaxPath:
        if flat:
            return (f"{kind}_{i}_{sub}_{j}",) + (("block",) if sub == "resnets" else ())
        return (f"{kind}_{i}", f"{sub}_{j}")

    m = re.match(r"conv_in\.(weight|bias)$", key)
    if m:
        return _map_conv(m.group(1), ("conv_in",))
    m = re.match(r"time_embedding\.(linear_1|linear_2)\.(weight|bias)$", key)
    if m:
        return _map_dense(m.group(2), ("time_embedding", m.group(1)))
    m = re.match(r"conv_norm_out\.(weight|bias)$", key)
    if m:
        return _map_norm(m.group(1), ("conv_norm_out",))
    m = re.match(r"conv_out\.(weight|bias)$", key)
    if m:
        return _map_conv(m.group(1), ("conv_out",))
    if key.startswith("time_proj"):
        return "skip"  # sinusoid table, no params

    m = re.match(r"(down_blocks|up_blocks)\.(\d+)\.resnets\.(\d+)\.(.+)$", key)
    if m:
        kind, i, j, rest = m.groups()
        return _map_resnet(rest, block_base(kind, i, "resnets", j))
    m = re.match(r"(down_blocks|up_blocks)\.(\d+)\.attentions\.(\d+)\.(.+)$", key)
    if m:
        kind, i, j, rest = m.groups()
        return _map_spatial_transformer(rest, block_base(kind, i, "attentions", j))
    m = re.match(r"(down_blocks|up_blocks)\.(\d+)\.audio_modules\.(\d+)\.(.+)$", key)
    if m:
        kind, i, j, rest = m.groups()
        return _map_spatial_transformer(rest, block_base(kind, i, "audio_modules", j))
    m = re.match(r"(down_blocks|up_blocks)\.(\d+)\.motion_modules\.(\d+)\.(.+)$", key)
    if m:
        kind, i, j, rest = m.groups()
        return _map_motion_module(rest, block_base(kind, i, "motion_modules", j))
    m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        base = (
            (f"down_blocks_{i}_downsamplers_0",)
            if flat
            else (f"down_blocks_{i}", "downsamplers_0")
        )
        return _map_conv(wb, base + ("conv",))
    m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        base = (
            (f"up_blocks_{i}_upsamplers_0",)
            if flat
            else (f"up_blocks_{i}", "upsamplers_0")
        )
        return _map_conv(wb, base + ("conv",))

    m = re.match(r"mid_block\.resnets\.(\d+)\.(.+)$", key)
    if m:
        j, rest = m.groups()
        base = (f"mid_block_resnets_{j}", "block") if flat else ("mid_block", f"resnets_{j}")
        return _map_resnet(rest, base)
    m = re.match(r"mid_block\.attentions\.(\d+)\.(.+)$", key)
    if m:
        j, rest = m.groups()
        base = (f"mid_block_attentions_{j}",) if flat else ("mid_block", f"attentions_{j}")
        return _map_spatial_transformer(rest, base)
    m = re.match(r"mid_block\.audio_modules\.(\d+)\.(.+)$", key)
    if m:
        j, rest = m.groups()
        base = ("mid_block", f"audio_modules_{j}")
        return _map_spatial_transformer(rest, base)
    m = re.match(r"mid_block\.motion_modules\.(\d+)\.(.+)$", key)
    if m:
        j, rest = m.groups()
        base = ("mid_block", f"motion_modules_{j}")
        return _map_motion_module(rest, base)
    return None


# ---------------------------------------------------------------------------
# small-module mappers
# ---------------------------------------------------------------------------


def map_face_locator_key(key: str):
    m = re.match(r"(conv_in|conv_out)\.(weight|bias)$", key)
    if m:
        return _map_conv(m.group(2), (m.group(1),))
    m = re.match(r"blocks\.(\d+)\.(weight|bias)$", key)
    if m:
        return _map_conv(m.group(2), (f"blocks_{m.group(1)}",))
    return None


def map_image_proj_key(key: str):
    m = re.match(r"proj\.(weight|bias)$", key)
    if m:
        return _map_dense(m.group(1), ("proj",))
    m = re.match(r"norm\.(weight|bias)$", key)
    if m:
        return _map_norm(m.group(1), ("norm",))
    return None


def map_audio_proj_key(key: str):
    m = re.match(r"(proj1|proj2|proj3)\.(weight|bias)$", key)
    if m:
        return _map_dense(m.group(2), (m.group(1),))
    m = re.match(r"norm\.(weight|bias)$", key)
    if m:
        return _map_norm(m.group(1), ("norm",))
    return None


def map_vae_key(key: str):
    """diffusers AutoencoderKL -> hallo_tpu AutoencoderKL paths."""

    def vae_resnet(rest, base):
        out = _map_resnet(rest, base)
        return out

    # old checkpoints name attention q/k/v differently
    attn_renames = {
        "query": "to_q", "key": "to_k", "value": "to_v", "proj_attn": "to_out",
    }

    def vae_attn(rest, base):
        m = re.match(r"group_norm\.(weight|bias)$", rest)
        if m:
            return _map_norm(m.group(1), base + ("group_norm",))
        m = re.match(r"(to_q|to_k|to_v|query|key|value)\.(weight|bias)$", rest)
        if m:
            name = attn_renames.get(m.group(1), m.group(1))
            path = base + (name, m.group(2).replace("weight", "kernel"))
            tf = t_linear if m.group(2) == "weight" else None
            return path, tf
        m = re.match(r"(to_out\.0|proj_attn)\.(weight|bias)$", rest)
        if m:
            path = base + ("to_out", m.group(2).replace("weight", "kernel"))
            tf = t_linear if m.group(2) == "weight" else None
            return path, tf
        return None

    m = re.match(r"quant_conv\.(weight|bias)$", key)
    if m:
        return _map_conv(m.group(1), ("encoder", "quant_conv"))
    m = re.match(r"post_quant_conv\.(weight|bias)$", key)
    if m:
        return _map_conv(m.group(1), ("decoder", "post_quant_conv"))

    m = re.match(r"(encoder|decoder)\.(.+)$", key)
    if not m:
        return None
    side, rest = m.groups()
    base = (side,)
    m = re.match(r"conv_in\.(weight|bias)$", rest)
    if m:
        return _map_conv(m.group(1), base + ("conv_in",))
    m = re.match(r"conv_norm_out\.(weight|bias)$", rest)
    if m:
        return _map_norm(m.group(1), base + ("conv_norm_out",))
    m = re.match(r"conv_out\.(weight|bias)$", rest)
    if m:
        return _map_conv(m.group(1), base + ("conv_out",))
    m = re.match(r"(down|up)_blocks\.(\d+)\.resnets\.(\d+)\.(.+)$", rest)
    if m:
        kind, i, j, r2 = m.groups()
        return vae_resnet(r2, base + (f"{kind}_{i}_resnets_{j}",))
    m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(weight|bias)$", rest)
    if m:
        i, wb = m.groups()
        # raw nn.Conv (no wrapper) in VAEEncoder
        path = base + (f"down_{i}_downsample", "kernel" if wb == "weight" else "bias")
        return path, (t_conv2d if wb == "weight" else None)
    m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(weight|bias)$", rest)
    if m:
        i, wb = m.groups()
        return _map_conv(wb, base + (f"up_{i}_upsample",))
    m = re.match(r"mid_block\.resnets\.(\d+)\.(.+)$", rest)
    if m:
        return vae_resnet(m.group(2), base + (f"mid_resnets_{m.group(1)}",))
    m = re.match(r"mid_block\.attentions\.0\.(.+)$", rest)
    if m:
        return vae_attn(m.group(1), base + ("mid_attn",))
    return None


def map_wav2vec_key(key: str, state_dict: Dict[str, Any]):
    key = key.removeprefix("wav2vec2.")
    m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.conv\.(weight|bias)$", key)
    if m:
        i, wb = m.groups()
        path = ("feature_extractor", f"conv_{i}", "kernel" if wb == "weight" else "bias")
        return path, (t_conv1d if wb == "weight" else None)
    m = re.match(r"feature_extractor\.conv_layers\.0\.layer_norm\.(weight|bias)$", key)
    if m:
        name = "gn0_scale" if m.group(1) == "weight" else "gn0_bias"
        return ("feature_extractor", name), None
    m = re.match(r"feature_projection\.layer_norm\.(weight|bias)$", key)
    if m:
        return _map_norm(m.group(1), ("fp_layer_norm",))
    m = re.match(r"feature_projection\.projection\.(weight|bias)$", key)
    if m:
        return _map_dense(m.group(1), ("fp_projection",))
    if "pos_conv_embed" in key:
        return "special_pos_conv"
    m = re.match(r"encoder\.layer_norm\.(weight|bias)$", key)
    if m:
        return _map_norm(m.group(1), ("encoder_layer_norm",))
    m = re.match(
        r"encoder\.layers\.(\d+)\.attention\.(q_proj|k_proj|v_proj|out_proj)\.(weight|bias)$",
        key,
    )
    if m:
        i, name, wb = m.groups()
        path = (f"layers_{i}", name, "kernel" if wb == "weight" else "bias")
        return path, (t_linear if wb == "weight" else None)
    m = re.match(r"encoder\.layers\.(\d+)\.(layer_norm|final_layer_norm)\.(weight|bias)$", key)
    if m:
        return _map_norm(m.group(3), (f"layers_{m.group(1)}", m.group(2)))
    m = re.match(
        r"encoder\.layers\.(\d+)\.feed_forward\.(intermediate_dense|output_dense)\.(weight|bias)$",
        key,
    )
    if m:
        i, name, wb = m.groups()
        short = "intermediate" if name == "intermediate_dense" else "output"
        path = (f"layers_{i}", short, "kernel" if wb == "weight" else "bias")
        return path, (t_linear if wb == "weight" else None)
    if key.startswith(("masked_spec_embed", "feature_projection.dropout",
                       "encoder.pos_conv_embed")):
        return "skip"
    return "skip" if key.startswith(("adapter", "quantizer", "project_")) else None


def _wav2vec_pos_conv(state_dict: Dict[str, Any]) -> List[Entry]:
    """Resolve the weight-normed positional conv (dim=2 weight norm)."""
    entries: List[Entry] = []
    prefixes = ["encoder.pos_conv_embed.conv.", "wav2vec2.encoder.pos_conv_embed.conv."]
    for p in prefixes:
        g_key = v_key = None
        if p + "weight_g" in state_dict:
            g_key, v_key = p + "weight_g", p + "weight_v"
        elif p + "parametrizations.weight.original0" in state_dict:
            g_key = p + "parametrizations.weight.original0"
            v_key = p + "parametrizations.weight.original1"
        if g_key is None:
            continue
        g, v = _np(state_dict[g_key]), _np(state_dict[v_key])
        norm = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)  # (O, I/groups, K)
        entries.append((("pos_conv", "kernel"), t_conv1d(w)))
        if p + "bias" in state_dict:
            entries.append((("pos_conv", "bias"), _np(state_dict[p + "bias"])))
        break
    return entries


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------


def convert_state_dict(
    state_dict: Dict[str, Any],
    mapper: Callable[[str], Any],
) -> Tuple[Dict[FlaxPath, np.ndarray], List[str]]:
    """Apply a key mapper over a torch state dict.

    Returns ({flax_path: array}, [unmapped torch keys])."""
    out: Dict[FlaxPath, np.ndarray] = {}
    unmapped: List[str] = []
    for key, value in state_dict.items():
        result = mapper(key)
        if result == "skip":
            continue
        if result is None or result == "special_pos_conv":
            if result is None:
                unmapped.append(key)
            continue
        path, transform = result
        arr = _np(value)
        if transform is not None:
            arr = transform(arr)
        out[path] = arr
    return out, unmapped


def overlay_params(
    init_params: Dict[str, Any],
    entries: Dict[FlaxPath, np.ndarray],
    strict_shapes: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Overlay converted arrays onto a random-init flax pytree.

    Shape mismatches keep the random init, mirroring from_pretrained_2d's
    tolerance (unet_3d.py:824-830). Returns (params, report)."""
    import jax

    report = {"loaded": [], "missing_in_ckpt": [], "shape_mismatch": [],
              "unused_ckpt": []}
    flat = dict(jax.tree_util.tree_flatten_with_path(init_params)[0])
    flat_by_path = {}
    for path_keys, leaf in jax.tree_util.tree_flatten_with_path(init_params)[0]:
        keys = tuple(getattr(k, "key", str(k)) for k in path_keys)
        # strip the leading "params" collection key
        if keys and keys[0] == "params":
            keys = keys[1:]
        flat_by_path[keys] = leaf

    new_leaves = {}
    used = set()
    for keys, leaf in flat_by_path.items():
        if keys in entries:
            arr = entries[keys]
            if tuple(arr.shape) == tuple(leaf.shape):
                new_leaves[keys] = arr.astype(np.asarray(leaf).dtype)
                report["loaded"].append("/".join(keys))
            else:
                if strict_shapes:
                    raise ValueError(
                        f"shape mismatch at {'/'.join(keys)}: "
                        f"ckpt {arr.shape} vs model {leaf.shape}"
                    )
                new_leaves[keys] = leaf
                report["shape_mismatch"].append("/".join(keys))
            used.add(keys)
        else:
            new_leaves[keys] = leaf
            report["missing_in_ckpt"].append("/".join(keys))
    report["unused_ckpt"] = ["/".join(k) for k in entries.keys() - used]

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return new_leaves[prefix]

    if "params" in init_params and isinstance(init_params.get("params"), dict):
        rebuilt = {"params": rebuild(init_params["params"])}
        extra = {k: v for k, v in init_params.items() if k != "params"}
        rebuilt.update(extra)
    else:
        rebuilt = rebuild(init_params)
    return rebuilt, report


# ---------------------------------------------------------------------------
# high-level entry points
# ---------------------------------------------------------------------------


def split_net_pth(state_dict: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Split hallo's fused net.pth into per-module state dicts
    (scripts/inference.py:51-94 Net attribute names)."""
    groups = {
        "reference_unet": {}, "denoising_unet": {}, "face_locator": {},
        "imageproj": {}, "audioproj": {},
    }
    for key, value in state_dict.items():
        for prefix in groups:
            if key.startswith(prefix + "."):
                groups[prefix][key[len(prefix) + 1:]] = value
                break
    return groups


def convert_reference_unet(state_dict, init_params, strict=False):
    entries, unmapped = convert_state_dict(
        state_dict, lambda k: map_unet_key(k, "reference")
    )
    params, report = overlay_params(init_params, entries, strict_shapes=strict)
    report["unmapped_ckpt_keys"] = unmapped
    return params, report


def convert_denoising_unet(state_dicts, init_params, strict=False):
    """state_dicts: list of torch state dicts merged in order (SD-1.5 2D,
    then AnimateDiff motion, then hallo fine-tune), later wins."""
    merged: Dict[FlaxPath, np.ndarray] = {}
    unmapped_all: List[str] = []
    for sd in state_dicts:
        entries, unmapped = convert_state_dict(
            sd, lambda k: map_unet_key(k, "denoise")
        )
        merged.update(entries)
        unmapped_all.extend(unmapped)
    params, report = overlay_params(init_params, merged, strict_shapes=strict)
    report["unmapped_ckpt_keys"] = unmapped_all
    return params, report


def convert_vae(state_dict, init_params, strict=True):
    entries, unmapped = convert_state_dict(state_dict, map_vae_key)
    params, report = overlay_params(init_params, entries, strict_shapes=strict)
    report["unmapped_ckpt_keys"] = unmapped
    return params, report


def convert_face_locator(state_dict, init_params, strict=True):
    entries, unmapped = convert_state_dict(state_dict, map_face_locator_key)
    params, report = overlay_params(init_params, entries, strict_shapes=strict)
    report["unmapped_ckpt_keys"] = unmapped
    return params, report


def convert_image_proj(state_dict, init_params, strict=True):
    entries, unmapped = convert_state_dict(state_dict, map_image_proj_key)
    params, report = overlay_params(init_params, entries, strict_shapes=strict)
    report["unmapped_ckpt_keys"] = unmapped
    return params, report


def convert_audio_proj(state_dict, init_params, strict=True):
    entries, unmapped = convert_state_dict(state_dict, map_audio_proj_key)
    params, report = overlay_params(init_params, entries, strict_shapes=strict)
    report["unmapped_ckpt_keys"] = unmapped
    return params, report


def convert_wav2vec(state_dict, init_params, strict=True):
    entries, unmapped = convert_state_dict(
        state_dict, lambda k: map_wav2vec_key(k, state_dict)
    )
    for path, arr in _wav2vec_pos_conv(state_dict):
        entries[path] = arr
    params, report = overlay_params(init_params, entries, strict_shapes=strict)
    report["unmapped_ckpt_keys"] = unmapped
    return params, report


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out
