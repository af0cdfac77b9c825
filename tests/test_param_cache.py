"""Disk cache for random-init params (utils/factory.py, HALLO_PARAM_CACHE):
a cache hit must return bit-identical params to a fresh init, keys must
separate configs, and bf16 trees must bypass the cache (np.savez cannot
carry ml_dtypes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hallo_tpu.utils.factory import build_models


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "param_cache"
    monkeypatch.setenv("HALLO_PARAM_CACHE", str(d))
    return d


def test_cache_roundtrip_bit_identical(cache_dir):
    kw = dict(height=64, width=64, clip_length=2, n_motion_frames=2)
    fresh = build_models("tiny", init_key=jax.random.PRNGKey(3), **kw).params
    files = list(cache_dir.glob("params_*.npz"))
    assert len(files) == 1, files
    # different spatial/clip shapes must HIT the same entry (param values
    # are shape-independent — the factory docstring's claim, pinned here)
    cached = build_models(
        "tiny", init_key=jax.random.PRNGKey(3),
        height=128, width=128, clip_length=4, n_motion_frames=2,
    ).params
    assert len(list(cache_dir.glob("params_*.npz"))) == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        fresh, cached,
    )


def test_cache_key_separates_seed_and_overrides(cache_dir):
    kw = dict(height=64, width=64, clip_length=2, n_motion_frames=2)
    build_models("tiny", init_key=jax.random.PRNGKey(0), **kw)
    build_models("tiny", init_key=jax.random.PRNGKey(1), **kw)
    build_models(
        "tiny", init_key=jax.random.PRNGKey(0),
        unet_overrides=dict(remat=True), **kw,
    )
    assert len(list(cache_dir.glob("params_*.npz"))) == 3


def test_bf16_params_bypass_cache(cache_dir):
    build_models(
        "tiny", init_key=jax.random.PRNGKey(0), height=64, width=64,
        clip_length=2, n_motion_frames=2, param_dtype=jnp.bfloat16,
    )
    assert not list(cache_dir.glob("params_*.npz"))
