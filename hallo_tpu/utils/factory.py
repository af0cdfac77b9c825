"""Model factory: build the five-network bundle at different scales.

"full" is the production SD-1.5-based configuration (SURVEY.md appendix
invariants); "tiny" is for CPU tests and multichip dry-runs.

With $HALLO_PARAM_CACHE set to a directory (tests/conftest.py does),
random-init params are cached to disk: param SHAPES/VALUES depend only on
the module configs + init key (never on height/width/clip_length — those
only shape the init traces), so one init serves every test. On this 1-core
host the six jit-inits are the dominant per-test cost (r2 suite: 28½ min).
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hallo_tpu.config import (
    AudioProjConfig,
    FaceLocatorConfig,
    ImageProjConfig,
    MotionModuleConfig,
    VAEConfig,
    denoising_unet_config,
    reference_unet_config,
)
from hallo_tpu.pipelines.face_animate import HalloModels

TINY_UNET_KW = dict(
    block_out_channels=(8, 16, 16, 16),
    layers_per_block=1,
    num_attention_heads=2,
    cross_attention_dim=12,
    norm_num_groups=4,
    audio_attention_dim=6,
    motion_module=MotionModuleConfig(
        num_attention_heads=2,
        temporal_position_encoding_max_len=8,
        norm_num_groups=4,
    ),
)

TINY_AUX = dict(
    vae_config=VAEConfig(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1, norm_num_groups=4
    ),
    face_locator_config=FaceLocatorConfig(
        conditioning_embedding_channels=8, block_out_channels=(4, 4, 4, 4)
    ),
    image_proj_config=ImageProjConfig(cross_attention_dim=12, clip_embeddings_dim=16),
    audio_proj_config=AudioProjConfig(
        seq_len=3, blocks=2, channels=4, intermediate_dim=8, output_dim=6,
        context_tokens=3,
    ),
)


def build_models(
    scale: str = "full",
    dtype=jnp.float32,
    init_key: Optional[jax.Array] = None,
    height: int = 512,
    width: int = 512,
    clip_length: int = 16,
    n_motion_frames: int = 2,
    unet_overrides: Optional[Dict[str, Any]] = None,
    param_dtype=None,
) -> HalloModels:
    overrides = dict(unet_overrides or {})
    if scale == "tiny":
        kw = dict(TINY_UNET_KW)
        kw.update(overrides)
        models = HalloModels.create(
            reference_unet_config(**kw),
            denoising_unet_config(**kw),
            params={},
            dtype=dtype,
            **TINY_AUX,
        )
    elif scale == "full":
        models = HalloModels.create(
            reference_unet_config(**overrides),
            denoising_unet_config(**overrides),
            params={},
            dtype=dtype,
        )
    else:
        raise ValueError(scale)
    if init_key is not None:
        cached = _param_cache_get(scale, overrides, dtype, param_dtype, init_key)
        if cached is not None:
            models.params = cached
        else:
            models.init_params(
                init_key,
                height=height,
                width=width,
                clip_length=clip_length,
                n_motion_frames=n_motion_frames,
                param_dtype=param_dtype,
            )
            _param_cache_put(
                scale, overrides, dtype, param_dtype, init_key, models.params
            )
    return models


# ---------------------------------------------------------------------------
# Disk cache for random-init params (tests; see module docstring)


def _param_cache_path(scale, overrides, dtype, param_dtype, init_key):
    root = os.environ.get("HALLO_PARAM_CACHE")
    if not root or scale == "full":  # full-scale params are GBs; never cache
        return None
    import numpy as np

    try:
        key_bytes = np.asarray(jax.random.key_data(init_key)).tobytes()
    except Exception:
        key_bytes = np.asarray(init_key).tobytes()
    tag = repr((scale, sorted((k, repr(v)) for k, v in overrides.items()),
                str(dtype), str(param_dtype)))
    digest = hashlib.sha1(tag.encode() + key_bytes).hexdigest()[:16]
    return os.path.join(root, f"params_{digest}.npz")


def _flatten(tree, prefix="", out=None):
    from collections.abc import Mapping

    out = {} if out is None else out
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            _flatten(v, p, out)
        else:
            out[p] = v
    return out


def _param_cache_get(scale, overrides, dtype, param_dtype, init_key):
    path = _param_cache_path(scale, overrides, dtype, param_dtype, init_key)
    if not path or not os.path.exists(path):
        return None
    import numpy as np

    try:
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
    except Exception:
        return None
    params: Dict[str, Any] = {}
    for k, v in flat.items():
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return params


def _param_cache_put(scale, overrides, dtype, param_dtype, init_key, params):
    path = _param_cache_path(scale, overrides, dtype, param_dtype, init_key)
    if not path:
        return
    import numpy as np

    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    if any(v.dtype.kind not in "fiub" for v in flat.values()):
        return  # ml_dtypes (bf16 etc.) don't survive np.savez; skip caching
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # np.savez appends ".npz" when the name lacks it — keep the suffix so
    # the atomic rename source matches what was actually written.
    tmp = f"{path[:-4]}.tmp{os.getpid()}.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def dummy_clip_inputs(
    models: HalloModels,
    height: int,
    width: int,
    clip_length: int,
    n_motion_frames: int,
    batch: int = 1,
    seed: int = 0,
) -> Dict[str, Any]:
    """Random pipeline-call inputs with the right shapes."""
    import numpy as np

    ip = models.image_proj.config
    ap = models.audio_proj.config
    rng = np.random.default_rng(seed)
    hl, wl = height // 8, width // 8
    return dict(
        ref_image=rng.uniform(-1, 1, size=(batch, height, width, 3)).astype(np.float32),
        audio_windows=rng.normal(
            size=(clip_length, ap.seq_len, ap.blocks, ap.channels)
        ).astype(np.float32),
        face_emb=rng.normal(size=(batch, ip.clip_embeddings_dim)).astype(np.float32),
        face_region=np.ones((batch, height, width, 3), np.float32),
        masks=tuple(
            tuple(
                np.ones((batch, (hl // 2**d) * (wl // 2**d)), np.float32)
                for _ in range(3)
            )
            for d in range(4)
        ),
    )
