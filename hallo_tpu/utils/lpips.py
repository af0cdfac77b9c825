"""LPIPS (AlexNet variant) in pure JAX — the north-star acceptance metric.

BASELINE.json's acceptance bar is "LPIPS parity" on the HF inference
samples. This module implements the standard LPIPS-alex distance
(Zhang et al., CVPR 2018: scaling layer -> AlexNet conv features at the
five ReLU taps -> per-channel unit-normalize -> learned 1x1 linear weights
on the squared difference -> spatial mean -> sum over taps) as pure jnp,
plus a converter from the reference ecosystem's torch weights.

No AlexNet/LPIPS weights ship in this environment, so everything is gated
on a weights file: `pretrained_models/lpips_alex.pth`, produced with
`torch.save(lpips.LPIPS(net='alex').state_dict(), path)` on any machine
with the `lpips` pip package. When the file is absent the caller reports
LPIPS as skipped-with-reason (scripts/eval_cache_quality.py).

Reference surface being matched: richzhang/PerceptualSimilarity
lpips/lpips.py (LPIPS.forward) + lpips/pretrained_networks.py (alexnet
slices over torchvision features indices 0..11). The layer inventory:
conv1 64@11x11 s4 p2 | pool3x3 s2 | conv2 192@5x5 p2 | pool | conv3
384@3x3 p1 | conv4 256@3x3 p1 | conv5 256@3x3 p1, taps after each ReLU.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet `features` module indices of the five convolutions —
# these appear verbatim in the lpips state-dict key names
# (net.slice{k}.{index}.weight).
_CONV_INDICES = (0, 3, 6, 8, 10)
_TAP_CHANNELS = (64, 192, 384, 256, 256)
# (stride, padding) per conv; pools are 3x3 stride-2 VALID before convs 2/3.
_CONV_STRIDE = (4, 1, 1, 1, 1)
_CONV_PAD = (2, 2, 1, 1, 1)
_POOL_BEFORE = (False, True, True, False, False)

# ImageNet scaling layer constants (lpips/lpips.py ScalingLayer) — inputs
# are RGB in [-1, 1].
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_lpips_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch `lpips.LPIPS(net='alex').state_dict()` -> JAX param pytree.

    Conv weights go OIHW -> HWIO; the lin weights (1, C, 1, 1) flatten to
    (C,). Raises KeyError listing anything missing, so a wrong file fails
    loudly at load."""

    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    params: Dict[str, Any] = {"convs": [], "lins": []}
    missing = []
    for k, idx in enumerate(_CONV_INDICES):
        wk, bk = f"net.slice{k + 1}.{idx}.weight", f"net.slice{k + 1}.{idx}.bias"
        if wk not in state_dict or bk not in state_dict:
            missing.append(wk)
            continue
        w = _np(state_dict[wk]).astype(np.float32).transpose(2, 3, 1, 0)
        b = _np(state_dict[bk]).astype(np.float32)
        params["convs"].append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
    for k, c in enumerate(_TAP_CHANNELS):
        lk = f"lin{k}.model.1.weight"
        if lk not in state_dict:
            missing.append(lk)
            continue
        lin = _np(state_dict[lk]).astype(np.float32).reshape(-1)
        if lin.shape[0] != c:
            raise ValueError(f"{lk}: expected {c} channels, got {lin.shape[0]}")
        params["lins"].append(jnp.asarray(lin))
    if missing:
        raise KeyError(f"LPIPS state dict is missing keys: {missing}")
    return params


def _alexnet_taps(params, x: jax.Array):
    """x: (B, H, W, 3) scaled input -> list of 5 post-ReLU feature maps."""
    taps = []
    for k, conv in enumerate(params["convs"]):
        if _POOL_BEFORE[k]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
        p = _CONV_PAD[k]
        s = _CONV_STRIDE[k]
        x = jax.lax.conv_general_dilated(
            x, conv["kernel"], (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + conv["bias"]
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


def lpips_distance(params, a: jax.Array, b: jax.Array) -> jax.Array:
    """LPIPS-alex distance per batch element.

    a, b: (B, H, W, 3) RGB in [-1, 1], float. Returns (B,) float32."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def feats(x):
        x = (x.astype(jnp.float32) - shift) / scale
        out = []
        for t in _alexnet_taps(params, x):
            norm = jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True) + 1e-10)
            out.append(t / norm)
        return out

    fa, fb = feats(a), feats(b)
    total = 0.0
    for k, lin in enumerate(params["lins"]):
        d = (fa[k] - fb[k]) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


DEFAULT_WEIGHTS = "pretrained_models/lpips_alex.pth"


def load_lpips(path: Optional[str] = None):
    """Load LPIPS params from a torch .pth, or return (None, reason).

    Looks at `path`, $HALLO_LPIPS_WEIGHTS, then DEFAULT_WEIGHTS relative to
    the repo root. Never raises on a missing file — LPIPS is an optional
    metric; callers print the reason instead of a number."""
    candidates = [
        path,
        os.environ.get("HALLO_LPIPS_WEIGHTS"),
        DEFAULT_WEIGHTS,
        os.path.join(os.path.dirname(__file__), "..", "..", DEFAULT_WEIGHTS),
    ]
    found = next((c for c in candidates if c and os.path.exists(c)), None)
    if found is None:
        return None, (
            "LPIPS weights not found (expected pretrained_models/"
            "lpips_alex.pth = torch.save(lpips.LPIPS(net='alex')"
            ".state_dict())); metric skipped"
        )
    try:
        import torch

        sd = torch.load(found, map_location="cpu", weights_only=True)
    except Exception as e:  # pragma: no cover - env-dependent
        return None, f"LPIPS weights at {found} failed to load: {e}"
    return convert_lpips_state_dict(sd), f"loaded {found}"


def lpips_from_uint8(params, a: np.ndarray, b: np.ndarray) -> float:
    """Mean LPIPS between two uint8 frame stacks (..., H, W, 3)."""
    a = jnp.asarray(a, jnp.float32).reshape(-1, *a.shape[-3:]) / 127.5 - 1.0
    b = jnp.asarray(b, jnp.float32).reshape(-1, *b.shape[-3:]) / 127.5 - 1.0
    return float(jnp.mean(jax.jit(lpips_distance)(params, a, b)))
