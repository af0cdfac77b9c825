"""Mask geometry vs the reference formulas (util.py:323-664) and the config
system (YAML load, CLI merge, unet kwargs ingestion)."""

import numpy as np
import pytest

from hallo_tpu import config as cfglib
from hallo_tpu.utils import masks as mk


def test_expand_region_clamps_by_shifting():
    # reference expand_region shifts the window back inside the image
    # (util.py:529-564)
    r = mk.expand_region([0, 40, 0, 40], 100, 100, 2.0)
    assert r == (0, 80, 0, 80)  # shifted right/down, size preserved
    r = mk.expand_region([80, 100, 80, 100], 100, 100, 2.0)
    assert r == (60, 100, 60, 100)
    r = mk.expand_region([40, 60, 40, 60], 100, 100, 1.0)
    assert r == (40, 60, 40, 60)


def test_bbox_and_separated_masks():
    face = mk.bbox_mask((20, 20, 80, 80), 100, 100, 1.0)
    lip = mk.bbox_mask((40, 60, 60, 70), 100, 100, 1.0)
    assert face[50, 50] == 255 and face[5, 5] == 0
    bg, sep_face, lip_blur = mk.separated_masks(face, lip)
    assert bg.shape == (64, 64)
    # background is inverted: strong where the face is absent
    assert bg[2, 2] > 200 and bg[32, 32] < 60
    # lip region is removed from the face branch
    assert sep_face[32, 32] < mk.blur_mask(face)[32, 32]


def test_union_mask_bbox_fill():
    a = mk.bbox_mask((10, 10, 20, 20), 50, 50)
    b = mk.bbox_mask((30, 30, 40, 40), 50, 50)
    u = mk.union_mask([a, b])
    # bbox fill covers the hull between the two boxes (util.py:923-958)
    assert u[25, 25] == 255


def test_mask_pyramid_scales():
    m = mk.bbox_mask((0, 0, 256, 256), 512, 512)
    pyr = mk.mask_pyramid(m, 512)
    assert [p.shape for p in pyr] == [(1, 4096), (1, 1024), (1, 256), (1, 64)]
    assert pyr[0].max() <= 1.0 and pyr[0].min() >= 0.0


def test_yaml_load_merge_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nnested:\n  x: [1, 2]\n  y: hello\n")
    cfg = cfglib.load_yaml(str(p))
    assert cfg.a == 1 and cfg.nested.y == "hello"
    merged = cfglib.merge_cli_overrides(cfg, {"a": 5, "b": None, "nested": {"y": "z"}})
    assert merged.a == 5 and merged.nested.y == "z"
    assert merged.nested.x == [1, 2]  # untouched subtree survives
    assert "b" not in merged  # None CLI args dropped (filter_non_none)


def test_unet_kwargs_ingestion_matches_reference_yaml():
    cfg = cfglib.load_yaml("configs/inference/default.yaml")
    kw = cfglib.to_container(cfg.unet_additional_kwargs)
    unet = cfglib.unet_config_from_yaml_kwargs(kw)
    assert unet.use_motion_module and unet.use_audio_module
    assert unet.motion_module_mid_block
    assert unet.stack_enable_blocks_name == ("up", "down", "mid")
    assert unet.stack_enable_blocks_depth == (0, 1, 2, 3)
    assert unet.motion_module.temporal_position_encoding_max_len == 32
    assert unet.audio_attention_dim == 768


def test_load_config_python_module(tmp_path):
    """Trainers accept a .py config exposing `cfg` (reference
    train_stage1.py:765-780 via util.import_filename) in addition to YAML;
    attribute access must work like the YAML DotDict path."""
    from hallo_tpu.config import load_config

    p = tmp_path / "my_cfg.py"
    p.write_text(
        "cfg = {'exp_name': 'pyconf', 'seed': 7,\n"
        "       'solver': {'learning_rate': 1e-5},\n"
        "       'data': {'train_bs': 2}}\n"
    )
    cfg = load_config(str(p))
    assert str(cfg.exp_name) == "pyconf"
    assert int(cfg.seed) == 7
    assert float(cfg.solver.learning_rate) == 1e-5
    assert int(cfg.data.train_bs) == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_config(str(tmp_path / "nope.json"))
