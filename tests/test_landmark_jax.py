"""Fixture tests for the dense-landmark path WITHOUT mediapipe:
a synthetic 468-pt face-mesh ONNX model runs through the JAX ONNX executor
(data/landmark_jax.py) and drives the landmark mask geometry
(utils/masks.py) end-to-end via FaceAnalyzer — VERDICT r2 item 3.

The synthetic model follows the face-mesh contract (192x192 RGB in ->
(1, 1404) landmark tensor in crop-pixel units); its landmarks place the
face silhouette on an ellipse and the lips on a smaller ellipse, so the
masks they induce are tighter than (and measurably different from) the
bbox fallback."""

import numpy as np
import pytest

from hallo_tpu.convert.onnx_io import OnnxNode, save_onnx
from hallo_tpu.data.landmark_jax import JaxFaceLandmarker, find_landmark_model
from hallo_tpu.utils import masks as mk


def _node(op, inputs, outputs, **attrs):
    return OnnxNode(op, list(inputs), list(outputs), attrs)


def synthetic_landmarks() -> np.ndarray:
    """(468, 3) crop-space landmarks: silhouette ellipse centered (96, 100)
    radius (60, 75); lip ellipse centered (96, 140) radius (22, 10)."""
    lm = np.full((468, 3), 96.0, np.float32)
    sil = np.asarray(mk.SILHOUETTE_IDS)
    th = np.linspace(0, 2 * np.pi, len(sil), endpoint=False)
    lm[sil, 0] = 96 + 60 * np.cos(th)
    lm[sil, 1] = 100 + 75 * np.sin(th)
    lip = np.asarray(mk.LIP_IDS)
    th = np.linspace(0, 2 * np.pi, len(lip), endpoint=False)
    lm[lip, 0] = 96 + 22 * np.cos(th)
    lm[lip, 1] = 140 + 10 * np.sin(th)
    lm[:, 2] = 1.0
    return lm


@pytest.fixture(scope="module")
def mesh_onnx(tmp_path_factory):
    """Face-mesh-contract model: out = ReduceMean(x) * 0 + landmarks."""
    lm = synthetic_landmarks().reshape(1, -1)
    nodes = [
        _node("ReduceMean", ["x"], ["mu"], axes=[1, 2, 3], keepdims=0),
        _node("Mul", ["mu", "zero"], ["z"]),
        _node("Add", ["z", "lm"], ["landmarks"]),
    ]
    inits = {"zero": np.zeros((1,), np.float32), "lm": lm}
    path = str(tmp_path_factory.mktemp("mesh") / "face_landmark_468.onnx")
    save_onnx(path, nodes, inits, {"x": [1, 192, 192, 3]},
              {"landmarks": [1, 1404]})
    return path


def test_landmarker_identity_crop(mesh_onnx):
    """Full-image bbox on a 192x192 image: coords pass through unscaled."""
    lmk = JaxFaceLandmarker(mesh_onnx)
    img = np.random.default_rng(0).integers(0, 255, (192, 192, 3), np.uint8)
    pts = lmk(img, bbox=(0, 0, 192, 192))
    np.testing.assert_allclose(pts, synthetic_landmarks()[:, :2], atol=1e-3)


def test_landmarker_crop_mapping(mesh_onnx):
    """A 384x384 image with a full-image bbox crops to side 384 at origin
    (margin clamps to the image) -> landmarks scale by exactly 2."""
    lmk = JaxFaceLandmarker(mesh_onnx)
    img = np.zeros((384, 384, 3), np.uint8)
    pts = lmk(img, bbox=(0, 0, 384, 384))
    np.testing.assert_allclose(
        pts, synthetic_landmarks()[:, :2] * 2.0, atol=1e-3
    )


def test_landmarker_offset_bbox(mesh_onnx):
    """A small centered bbox maps crop coords back into image coords."""
    lmk = JaxFaceLandmarker(mesh_onnx)
    img = np.zeros((400, 400, 3), np.uint8)
    pts = lmk(img, bbox=(140, 140, 260, 260))  # 120px box -> 150px crop
    side = 150
    ox = oy = 200 - side // 2
    want = synthetic_landmarks()[:, :2] * (side / 192.0) + [ox, oy]
    np.testing.assert_allclose(pts, want, atol=1e-2)


def test_normalized_output_rescaled(tmp_path):
    """Exports emitting normalized [0,1] landmark coords are detected by
    the output-range heuristic and rescaled to crop pixels (ADVICE r3)."""
    lm = synthetic_landmarks()
    lm[:, :2] /= 192.0  # normalized-coordinate exporter variant
    nodes = [
        _node("ReduceMean", ["x"], ["mu"], axes=[1, 2, 3], keepdims=0),
        _node("Mul", ["mu", "zero"], ["z"]),
        _node("Add", ["z", "lm"], ["landmarks"]),
    ]
    inits = {"zero": np.zeros((1,), np.float32),
             "lm": lm.reshape(1, -1)}
    path = str(tmp_path / "mesh_norm.onnx")
    save_onnx(path, nodes, inits, {"x": [1, 192, 192, 3]},
              {"landmarks": [1, 1404]})
    lmk = JaxFaceLandmarker(path)
    img = np.zeros((192, 192, 3), np.uint8)
    pts = lmk(img, bbox=(0, 0, 192, 192))
    np.testing.assert_allclose(pts, synthetic_landmarks()[:, :2], atol=1e-2)


def test_nchw_signed_input(tmp_path):
    """NCHW layout + [-1,1] range exports are auto-detected/selectable."""
    lm = synthetic_landmarks().reshape(1, -1)
    nodes = [
        _node("ReduceMean", ["x"], ["mu"], axes=[1, 2, 3], keepdims=0),
        _node("Mul", ["mu", "zero"], ["z"]),
        _node("Add", ["z", "lm"], ["landmarks"]),
    ]
    inits = {"zero": np.zeros((1,), np.float32), "lm": lm}
    path = str(tmp_path / "facemesh_nchw.onnx")
    save_onnx(path, nodes, inits, {"x": [1, 3, 192, 192]},
              {"landmarks": [1, 1404]})
    lmk = JaxFaceLandmarker(path, input_range="signed")
    assert lmk._nchw and lmk._size == 192
    img = np.zeros((192, 192, 3), np.uint8)
    pts = lmk(img, bbox=(0, 0, 192, 192))
    np.testing.assert_allclose(pts, synthetic_landmarks()[:, :2], atol=1e-3)


def test_find_landmark_model_env_and_glob(mesh_onnx, tmp_path, monkeypatch):
    monkeypatch.setenv("HALLO_LANDMARK_ONNX", mesh_onnx)
    assert find_landmark_model(None) == mesh_onnx
    monkeypatch.delenv("HALLO_LANDMARK_ONNX")
    import os
    import shutil

    root = tmp_path / "face_analysis"
    (root / "models").mkdir(parents=True)
    shutil.copy(mesh_onnx, root / "models" / "face_landmark_468.onnx")
    assert find_landmark_model(str(root)).endswith("face_landmark_468.onnx")
    assert find_landmark_model(str(tmp_path / "absent")) is None
    assert not os.path.exists(str(tmp_path / "absent"))


def test_face_analyzer_masks_are_landmark_driven(mesh_onnx, monkeypatch):
    """End-to-end: FaceAnalyzer with only the landmark ONNX available must
    produce landmark-geometry masks (not the bbox/heuristic fallback)."""
    from hallo_tpu.data.face_analysis import FaceAnalyzer

    monkeypatch.setenv("HALLO_LANDMARK_ONNX", mesh_onnx)
    analyzer = FaceAnalyzer(model_path="/nonexistent", backend="auto")
    assert analyzer._landmarker is not None
    img = np.full((192, 192, 3), 128, np.uint8)

    face_mask, lip_mask, face = analyzer.face_and_lip_masks(img, 1.2)
    assert face.landmarks is not None and face.landmarks.shape == (468, 2)

    # The masks must equal the landmark geometry applied to the mesh output
    # ... and differ from what the detector-box fallback would produce.
    want_face = mk.face_mask_from_landmarks(face.landmarks, 192, 192, 1.2)
    want_lip = mk.lip_mask_from_landmarks(face.landmarks, 192, 192, 2.0)
    np.testing.assert_array_equal(face_mask, want_face)
    np.testing.assert_array_equal(lip_mask, want_lip)
    fallback = mk.bbox_mask(face.bbox, 192, 192, 1.2)
    assert (face_mask != fallback).any()

    # plausibility: lip mask sits inside the face mask and is much smaller
    assert 0 < lip_mask.sum() < face_mask.sum()
