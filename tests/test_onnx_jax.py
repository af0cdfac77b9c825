"""ONNX reader/writer + JAX executor + InsightFace-on-JAX tests.

Oracle strategy: graphs are built with hallo_tpu.convert.onnx_io.save_onnx
(standard wire encoding) and executed two ways — OnnxExecutor (JAX) vs a
hand-built torch replica holding the SAME weights. Covers the op set the
real SCRFD/ArcFace graphs use (reference image_processor.py:100-138 runs
them through onnxruntime; SURVEY.md §2.3 calls for this JAX port)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hallo_tpu.convert.onnx_io import OnnxNode, load_onnx, save_onnx
from hallo_tpu.convert.onnx_jax import OnnxExecutor


def _node(op, inputs, outputs, **attrs):
    return OnnxNode(op, list(inputs), list(outputs), attrs)


# ---------------------------------------------------------------------------
def test_roundtrip_reader_writer(tmp_path):
    w = np.random.default_rng(0).normal(size=(4, 3, 3, 3)).astype(np.float32)
    path = str(tmp_path / "m.onnx")
    save_onnx(
        path,
        [_node("Conv", ["x", "w"], ["y"], strides=[2, 2], pads=[1, 1, 1, 1])],
        {"w": w},
        inputs={"x": [1, 3, 8, 8]},
        outputs={"y": [1, 4, 4, 4]},
        opset=11,
    )
    m = load_onnx(path)
    assert m.opset == 11
    assert [n.op_type for n in m.graph.nodes] == ["Conv"]
    assert m.graph.nodes[0].attrs["strides"] == [2, 2]
    np.testing.assert_array_equal(m.graph.initializers["w"], w)
    assert m.graph.inputs == [("x", [1, 3, 8, 8])]
    assert m.graph.outputs == ["y"]


# ---------------------------------------------------------------------------
def test_cnn_vs_torch_oracle(tmp_path):
    """conv(s2,pad) -> BN -> PReLU -> maxpool(ceil) -> nearest x2 resize ->
    concat -> conv -> GAP -> flatten -> gemm, matching a torch replica."""
    rng = np.random.default_rng(1)
    w1 = rng.normal(size=(8, 3, 3, 3), scale=0.2).astype(np.float32)
    b1 = rng.normal(size=(8,)).astype(np.float32)
    bn_s = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    bn_b = rng.normal(size=(8,)).astype(np.float32)
    bn_m = rng.normal(size=(8,), scale=0.1).astype(np.float32)
    bn_v = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    slope = rng.uniform(0.1, 0.3, (8, 1, 1)).astype(np.float32)
    w2 = rng.normal(size=(4, 16, 1, 1), scale=0.2).astype(np.float32)
    gw = rng.normal(size=(6, 4), scale=0.3).astype(np.float32)  # transB
    gb = rng.normal(size=(6,)).astype(np.float32)

    nodes = [
        _node("Conv", ["x", "w1", "b1"], ["c1"], strides=[2, 2], pads=[1, 1, 1, 1]),
        _node("BatchNormalization", ["c1", "bn_s", "bn_b", "bn_m", "bn_v"],
              ["bn"], epsilon=1e-5),
        _node("PRelu", ["bn", "slope"], ["pr"]),
        _node("MaxPool", ["pr"], ["mp"], kernel_shape=[3, 3], strides=[2, 2],
              pads=[0, 0, 0, 0], ceil_mode=1),
        _node("Resize", ["mp", "", "scales"], ["up"], mode="nearest",
              coordinate_transformation_mode="asymmetric"),
        _node("Concat", ["pr", "up"], ["cat"], axis=1),
        _node("Conv", ["cat", "w2"], ["c2"]),
        _node("GlobalAveragePool", ["c2"], ["gap"]),
        _node("Flatten", ["gap"], ["fl"], axis=1),
        _node("Gemm", ["fl", "gw", "gb"], ["out"], transB=1),
    ]
    inits = dict(w1=w1, b1=b1, bn_s=bn_s, bn_b=bn_b, bn_m=bn_m, bn_v=bn_v,
                 slope=slope, w2=w2, gw=gw, gb=gb,
                 scales=np.array([1.0, 1.0, 2.0, 2.0], np.float32))
    path = str(tmp_path / "cnn.onnx")
    save_onnx(path, nodes, inits, {"x": [1, 3, 16, 16]}, {"out": [1, 6]})

    ex = OnnxExecutor(path)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    out = np.asarray(ex(ex.params, {"x": x})["out"])

    with torch.no_grad():
        t = torch.from_numpy(x)
        c1 = F.conv2d(t, torch.from_numpy(w1), torch.from_numpy(b1),
                      stride=2, padding=1)
        bn = F.batch_norm(c1, torch.from_numpy(bn_m), torch.from_numpy(bn_v),
                          torch.from_numpy(bn_s), torch.from_numpy(bn_b),
                          training=False, eps=1e-5)
        pr = F.prelu(bn, torch.from_numpy(slope.reshape(-1)))
        mp = F.max_pool2d(pr, 3, stride=2, ceil_mode=True)
        up = F.interpolate(mp, scale_factor=2, mode="nearest")
        cat = torch.cat([pr, up], dim=1)
        c2 = F.conv2d(cat, torch.from_numpy(w2))
        gap = c2.mean(dim=(2, 3))
        ref = gap @ torch.from_numpy(gw).T + torch.from_numpy(gb)
    np.testing.assert_allclose(out, ref.numpy(), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
def test_shape_subgraph_folding(tmp_path):
    """Exporter pattern: Shape -> Gather -> Unsqueeze -> Concat -> Reshape
    must fold on host (static shapes under jit)."""
    nodes = [
        _node("Shape", ["x"], ["sh"]),
        _node("Gather", ["sh", "zero"], ["b"], axis=0),
        _node("Unsqueeze", ["b"], ["b1"], axes=[0]),
        _node("Concat", ["b1", "minus1"], ["target"], axis=0),
        _node("Reshape", ["x", "target"], ["flat"]),
        _node("Softmax", ["flat"], ["out"], axis=1),
    ]
    inits = {"zero": np.array(0, np.int64),
             "minus1": np.array([-1], np.int64)}
    path = str(tmp_path / "fold.onnx")
    save_onnx(path, nodes, inits, {"x": [2, 3, 4]}, {"out": [2, 12]})
    ex = OnnxExecutor(path)
    x = np.random.default_rng(2).normal(size=(2, 3, 4)).astype(np.float32)
    out = np.asarray(ex.jit()(ex.params, {"x": x})["out"])
    ref = torch.softmax(torch.from_numpy(x).reshape(2, -1), dim=1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
def test_scrfd_decode_math():
    from hallo_tpu.data.insight_jax import distance2bbox, distance2kps, nms

    centers = np.array([[16.0, 32.0], [64.0, 64.0]], np.float32)
    dist = np.array([[8, 16, 8, 16], [10, 10, 20, 20]], np.float32)
    boxes = distance2bbox(centers, dist)
    np.testing.assert_allclose(boxes[0], [8, 16, 24, 48])
    np.testing.assert_allclose(boxes[1], [54, 54, 84, 84])

    kd = np.tile(np.array([[1.0, -2.0]], np.float32), (2, 5)).reshape(2, 10)
    kps = distance2kps(centers, kd)
    np.testing.assert_allclose(kps[0, 0], [17, 30])
    np.testing.assert_allclose(kps[1, 4], [65, 62])

    # NMS: two overlapping boxes keep the higher score; disjoint box stays
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, iou_thresh=0.4)
    assert keep == [0, 2]


def test_umeyama_recovers_similarity():
    from hallo_tpu.data.insight_jax import ARCFACE_TEMPLATE, umeyama_similarity

    rng = np.random.default_rng(3)
    theta, scale = 0.3, 1.7
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    t = np.array([12.0, -5.0])
    src = rng.uniform(0, 100, (5, 2))
    dst = scale * src @ rot.T + t
    m = umeyama_similarity(src, dst)
    mapped = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-3)
    # sanity on the real template: identity transform
    m = umeyama_similarity(ARCFACE_TEMPLATE, ARCFACE_TEMPLATE)
    np.testing.assert_allclose(m, np.array([[1, 0, 0], [0, 1, 0]]), atol=1e-5)


# ---------------------------------------------------------------------------
def _build_tiny_scrfd(path: str, det: int = 64) -> None:
    """A structurally-faithful mini SCRFD: 3 strides x (scores, bbox, kps)
    heads with 2 anchors/cell, heads emitted via Transpose+Reshape like the
    real graph. Random weights — tests plumbing + decode, not accuracy."""
    rng = np.random.default_rng(4)
    nodes, inits = [], {}
    nodes.append(_node("Conv", ["x", "w0", "b0"], ["f8"],
                       strides=[8, 8], pads=[1, 1, 1, 1]))
    inits["w0"] = rng.normal(size=(16, 3, 3, 3), scale=0.3).astype(np.float32)
    inits["b0"] = np.zeros(16, np.float32)
    nodes.append(_node("MaxPool", ["f8"], ["f16"], kernel_shape=[2, 2],
                       strides=[2, 2], pads=[0, 0, 0, 0]))
    nodes.append(_node("MaxPool", ["f16"], ["f32"], kernel_shape=[2, 2],
                       strides=[2, 2], pads=[0, 0, 0, 0]))
    score_names, bbox_names, kps_names = [], [], []
    for s, feat in ((8, "f8"), (16, "f16"), (32, "f32")):
        for kind, ch in (("score", 2), ("bbox", 8), ("kps", 20)):
            w = f"w_{kind}{s}"
            inits[w] = rng.normal(size=(ch, 16, 1, 1), scale=0.3).astype(np.float32)
            raw = f"{kind}{s}_raw"
            nodes.append(_node("Conv", [feat, w], [raw]))
            tr = f"{kind}{s}_t"
            nodes.append(_node("Transpose", [raw], [tr], perm=[0, 2, 3, 1]))
            out = f"{kind}_{s}"
            cols = {"score": 1, "bbox": 4, "kps": 10}[kind]
            if kind == "score":
                nodes.append(_node("Reshape", [tr, f"sh{cols}"], [f"{out}_l"]))
                nodes.append(_node("Sigmoid", [f"{out}_l"], [out]))
            else:
                nodes.append(_node("Reshape", [tr, f"sh{cols}"], [out]))
            inits.setdefault(f"sh{cols}", np.array([-1, cols], np.int64))
            {"score": score_names, "bbox": bbox_names, "kps": kps_names}[
                kind
            ].append(out)
    outputs = {}
    for n in score_names + bbox_names + kps_names:
        outputs[n] = [1, 1]  # shapes in value_info are advisory
    save_onnx(path, nodes, inits, {"x": [1, 3, det, det]}, outputs)


def test_scrfd_jax_end_to_end(tmp_path):
    from hallo_tpu.data.insight_jax import ScrfdJax

    path = str(tmp_path / "scrfd_tiny.onnx")
    _build_tiny_scrfd(path, det=64)
    det = ScrfdJax(path, det_size=(64, 64))
    assert det.with_kps
    img = np.random.default_rng(5).integers(0, 255, (96, 80, 3), np.uint8)
    boxes, kps = det.detect(img, score_thresh=0.0, iou_thresh=0.4)
    assert boxes.ndim == 2 and boxes.shape[1] == 5
    assert boxes.shape[0] >= 1  # thresh 0 keeps something after NMS
    assert np.isfinite(boxes).all()
    assert kps is not None and kps.shape[1:] == (5, 2)
    # scores sorted descending (NMS order)
    assert (np.diff(boxes[:, 4]) <= 1e-6).all()


def test_arcface_jax_vs_torch(tmp_path):
    from hallo_tpu.data.insight_jax import ArcFaceJax, norm_crop

    rng = np.random.default_rng(6)
    w1 = rng.normal(size=(6, 3, 3, 3), scale=0.2).astype(np.float32)
    slope = rng.uniform(0.1, 0.3, (6, 1, 1)).astype(np.float32)
    gw = rng.normal(size=(6 * 14 * 14, 16), scale=0.05).astype(np.float32)
    nodes = [
        _node("Conv", ["x", "w1"], ["c"], strides=[8, 8], pads=[1, 1, 1, 1]),
        _node("PRelu", ["c", "slope"], ["p"]),
        _node("Flatten", ["p"], ["fl"], axis=1),
        _node("MatMul", ["fl", "gw"], ["emb"]),
    ]
    path = str(tmp_path / "arc_tiny.onnx")
    save_onnx(path, nodes, dict(w1=w1, slope=slope, gw=gw),
              {"x": [1, 3, 112, 112]}, {"emb": [1, 16]})

    rec = ArcFaceJax(path)
    img = rng.integers(0, 255, (200, 160, 3), np.uint8)
    kps = np.array([[60, 80], [100, 78], [82, 100], [65, 120], [98, 118]],
                   np.float32)
    emb = rec.embed(img, kps)
    assert emb.shape == (16,)

    crop = norm_crop(img, kps)
    blob = (crop.astype(np.float32) - 127.5) / 127.5
    with torch.no_grad():
        t = torch.from_numpy(blob.transpose(2, 0, 1)[None])
        c = F.conv2d(t, torch.from_numpy(w1), stride=8, padding=1)
        p = F.prelu(c, torch.from_numpy(slope.reshape(-1)))
        ref = p.flatten(1) @ torch.from_numpy(gw)
    np.testing.assert_allclose(emb, ref.numpy().reshape(-1), rtol=2e-4, atol=2e-4)


def test_face_analyzer_picks_onnx_jax(tmp_path):
    """FaceAnalyzer auto mode uses the JAX backend when model files exist."""
    from hallo_tpu.data.face_analysis import FaceAnalyzer

    root = tmp_path / "face_analysis" / "models"
    root.mkdir(parents=True)
    _build_tiny_scrfd(str(root / "scrfd_tiny_bnkps.onnx"), det=64)
    # recognizer: reuse the arcface tiny graph
    rng = np.random.default_rng(7)
    nodes = [
        _node("Conv", ["x", "w1"], ["c"], strides=[16, 16]),
        _node("Flatten", ["c"], ["fl"], axis=1),
        _node("MatMul", ["fl", "gw"], ["emb"]),
    ]
    save_onnx(str(root / "glintr_tiny.onnx"), nodes,
              dict(w1=rng.normal(size=(4, 3, 1, 1), scale=0.3).astype(np.float32),
                   gw=rng.normal(size=(4 * 7 * 7, 512), scale=0.05).astype(np.float32)),
              {"x": [1, 3, 112, 112]}, {"emb": [1, 512]})

    fa = FaceAnalyzer(model_path=str(tmp_path / "face_analysis"))
    assert fa.backend == "onnx-jax"
    img = np.random.default_rng(8).integers(0, 255, (128, 128, 3), np.uint8)
    res = fa.detect(img)
    assert res.embedding.shape == (512,)
    assert np.isfinite(res.embedding).all()
    face_mask, lip_mask, _ = fa.face_and_lip_masks(img)
    assert face_mask.shape == (128, 128) and lip_mask.shape == (128, 128)


def test_grouped_and_depthwise_conv_vs_torch(tmp_path):
    """SCRFD-500m-class backbones use depthwise separable convs; cover
    feature_group_count handling against torch."""
    rng = np.random.default_rng(9)
    w_dw = rng.normal(size=(6, 1, 3, 3), scale=0.3).astype(np.float32)  # depthwise g=6
    w_g = rng.normal(size=(8, 3, 1, 1), scale=0.3).astype(np.float32)   # grouped g=2
    nodes = [
        _node("Conv", ["x", "w_dw"], ["d"], pads=[1, 1, 1, 1], group=6),
        _node("Conv", ["d", "w_g"], ["y"], group=2),
    ]
    path = str(tmp_path / "gc.onnx")
    save_onnx(path, nodes, dict(w_dw=w_dw, w_g=w_g),
              {"x": [1, 6, 10, 10]}, {"y": [1, 8, 10, 10]})
    ex = OnnxExecutor(path)
    x = rng.normal(size=(1, 6, 10, 10)).astype(np.float32)
    out = np.asarray(ex(ex.params, {"x": x})["y"])
    with torch.no_grad():
        t = torch.from_numpy(x)
        d = F.conv2d(t, torch.from_numpy(w_dw), padding=1, groups=6)
        ref = F.conv2d(d, torch.from_numpy(w_g), groups=2)
    np.testing.assert_allclose(out, ref.numpy(), rtol=2e-4, atol=2e-4)


def test_lip_box_from_scrfd_kps(monkeypatch):
    """With SCRFD 5-point keypoints present, the lip mask is anchored on
    the mouth corners instead of the bbox-lower-third heuristic."""
    from hallo_tpu.data.face_analysis import FaceAnalyzer, FaceResult

    fa = FaceAnalyzer(backend="auto")  # backend irrelevant; detect mocked
    res = FaceResult(
        (40.0, 40.0, 160.0, 200.0), np.zeros(512, np.float32),
        kps=np.array(
            [[70, 90], [130, 92], [100, 130], [80, 160], [120, 162]],
            np.float32,
        ),
    )
    monkeypatch.setattr(fa, "detect", lambda img: res)
    monkeypatch.setattr(fa, "_landmarks", lambda img, bbox=None: None)
    face_mask, lip_mask, _ = fa.face_and_lip_masks(
        np.zeros((256, 256, 3), np.uint8)
    )
    ys, xs = np.nonzero(lip_mask)
    assert len(xs) > 0
    # centered near the mouth-corner midpoint (100, 161)
    assert abs(xs.mean() - 100) < 8 and abs(ys.mean() - 161) < 10
    assert lip_mask[161, 100] > 0
    # the heuristic path (no kps) puts the box center lower (bbox-derived)
    res_nokps = FaceResult((40.0, 40.0, 160.0, 200.0), np.zeros(512, np.float32))
    monkeypatch.setattr(fa, "detect", lambda img: res_nokps)
    _, lip2, _ = fa.face_and_lip_masks(np.zeros((256, 256, 3), np.uint8))
    assert np.abs(lip2.astype(int) - lip_mask.astype(int)).sum() > 0


def test_conv_auto_pad_same_upper(tmp_path):
    """auto_pad=SAME_UPPER (exporter variant) matches torch's explicit
    asymmetric padding for even kernels/strides."""
    rng = np.random.default_rng(10)
    w = rng.normal(size=(4, 3, 3, 3), scale=0.3).astype(np.float32)
    nodes = [_node("Conv", ["x", "w"], ["y"], strides=[2, 2],
                   auto_pad="SAME_UPPER")]
    path = str(tmp_path / "ap.onnx")
    save_onnx(path, nodes, dict(w=w), {"x": [1, 3, 9, 9]}, {"y": [1, 4, 5, 5]})
    ex = OnnxExecutor(path)
    x = rng.normal(size=(1, 3, 9, 9)).astype(np.float32)
    out = np.asarray(ex(ex.params, {"x": x})["y"])
    # SAME_UPPER for in=9 k=3 s=2: out=5, total pad=2 -> (1 begin, 1 end)
    with torch.no_grad():
        ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                       stride=2, padding=1)
    assert out.shape == tuple(ref.shape)
    np.testing.assert_allclose(out, ref.numpy(), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Preflight op-coverage (VERDICT r2 #4): loading a graph with unsupported
# ops must fail AT INIT with the complete list, not mid-inference.
def test_check_support_preflight(tmp_path):
    from hallo_tpu.convert.onnx_jax import UnsupportedOnnxOps

    nodes = [
        _node("Relu", ["x"], ["h"]),
        _node("NonMaxSuppression", ["h"], ["h2"]),
        _node("LSTM", ["h2"], ["y"]),
    ]
    path = str(tmp_path / "bad.onnx")
    save_onnx(path, nodes, {}, {"x": [1, 4]}, {"y": [1, 4]})
    with pytest.raises(UnsupportedOnnxOps) as exc:
        OnnxExecutor(path)
    assert exc.value.ops == ["LSTM", "NonMaxSuppression"]
    assert "NonMaxSuppression" in str(exc.value)
    # strict=False defers to the per-node NotImplementedError (old behavior)
    ex = OnnxExecutor(path, strict=False)
    assert ex.check_support(ex.graph) == ["LSTM", "NonMaxSuppression"]


def test_known_model_op_inventories_supported():
    """Coverage contract: every op the production scrfd_10g_bnkps /
    glintr100 / Kim_Vocal_2 graphs are known to use has an executor kernel,
    so loading the real files cannot fail on op dispatch."""
    from hallo_tpu.convert.onnx_inventory import KNOWN_MODEL_OPS

    supported = OnnxExecutor.supported_ops()
    for model, ops in KNOWN_MODEL_OPS.items():
        missing = sorted(o for o in ops if o.lower() not in supported)
        assert not missing, f"{model}: executor lacks {missing}"


def test_real_onnx_files_check_support():
    """Authoritative preflight on the actual production files (gated:
    skipped when pretrained_models/ is absent in this environment)."""
    import os

    from hallo_tpu.convert.onnx_io import load_onnx

    candidates = [
        "pretrained_models/face_analysis/models/scrfd_10g_bnkps.onnx",
        "pretrained_models/face_analysis/models/glintr100.onnx",
        "pretrained_models/audio_separator/Kim_Vocal_2.onnx",
    ]
    found = [p for p in candidates if os.path.exists(p)]
    if not found:
        pytest.skip("real .onnx files not present in this environment")
    for p in found:
        m = load_onnx(p)
        missing = OnnxExecutor.check_support(m.graph)
        assert not missing, f"{p}: unsupported ops {missing}"


def test_pad_op_attribute_and_input_forms(tmp_path):
    """Pad both ways: opset<11 attribute pads and opset>=11 `pads` input
    (the FaceMesh conversions use Pad around stride-2 convs — see
    onnx_inventory.FACE_MESH)."""
    x = np.arange(24, dtype=np.float32).reshape(1, 2, 3, 4)

    path = str(tmp_path / "pad_attr.onnx")
    save_onnx(
        path,
        [_node("Pad", ["x"], ["y"], mode="constant",
               pads=[0, 0, 1, 2, 0, 0, 3, 4], value=1.5)],
        {},
        inputs={"x": [1, 2, 3, 4]},
        outputs={"y": [1, 2, 7, 10]},
        opset=10,
    )
    ex = OnnxExecutor(path)
    got = np.asarray(ex(ex.params, {"x": x})["y"])
    want = np.pad(x, ((0, 0), (0, 0), (1, 3), (2, 4)), constant_values=1.5)
    np.testing.assert_array_equal(got, want)

    path2 = str(tmp_path / "pad_input.onnx")
    pads = np.array([0, 0, 0, 1, 0, 0, 0, 2], np.int64)
    save_onnx(
        path2,
        [_node("Pad", ["x", "pads"], ["y"], mode="reflect")],
        {"pads": pads},
        inputs={"x": [1, 2, 3, 4]},
        outputs={"y": [1, 2, 3, 7]},
        opset=13,
    )
    ex2 = OnnxExecutor(path2)
    got2 = np.asarray(ex2(ex2.params, {"x": x})["y"])
    want2 = np.pad(x, ((0, 0), (0, 0), (0, 0), (1, 2)), mode="reflect")
    np.testing.assert_array_equal(got2, want2)
