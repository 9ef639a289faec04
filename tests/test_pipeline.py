"""Inference pipeline tests: the classify->COVID-gate->segment cascade."""

import numpy as np
import pytest

import jax

from medseg_tpu.core.config import CLASSES, EvalConfig
from medseg_tpu.core.registry import get_model
from medseg_tpu.infer import Pipeline, red_overlay, resize_mask_nearest
from medseg_tpu.train import checkpoint as ckpt


def test_resize_mask_nearest_matches_cv2(rng_np):
    cv2 = pytest.importorskip("cv2")
    mask = (rng_np.random((64, 64)) > 0.5).astype(np.uint8) * 255
    got = resize_mask_nearest(mask, 100, 90)
    want = cv2.resize(mask, (90, 100), interpolation=cv2.INTER_NEAREST)
    assert (got != want).mean() < 0.02


def test_red_overlay_matches_cv2_addweighted(rng_np):
    cv2 = pytest.importorskip("cv2")
    img = rng_np.integers(0, 256, (32, 32, 3), np.uint8)
    mask = (rng_np.random((32, 32)) > 0.5).astype(np.uint8) * 255
    got = red_overlay(img, mask, 0.5)
    # reference works in BGR with (0,0,255); equivalent to (255,0,0) in RGB
    bgr = img[:, :, ::-1].copy()
    overlay = np.zeros_like(bgr)
    overlay[mask == 255] = (0, 0, 255)
    want = cv2.addWeighted(bgr, 1.0, overlay, 0.5, 0)[:, :, ::-1]
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def _save_fresh_ckpt(tmp_path, name, seg, img_size=64):
    model = get_model(name)["factory"]()
    variables = model.init(jax.random.key(0),
                           np.zeros((1, img_size, img_size, 3), np.float32))
    sub = "segmentation_models" if seg else "classification_models"
    ckpt.save_best(str(tmp_path / sub), name, seg,
                   variables["params"], variables.get("batch_stats", {}))


def test_pipeline_cascade_and_gate(tmp_path, rng_np, capsys):
    _save_fresh_ckpt(tmp_path, "ResNet18", seg=False)
    _save_fresh_ckpt(tmp_path, "AttentionUNet", seg=True)
    pipe = Pipeline(EvalConfig(weights_root=str(tmp_path)))
    pipe._load_models("ResNet18", "AttentionUNet")

    img = rng_np.integers(0, 256, (100, 120, 3), np.uint8)
    pred, conf, overlay, text = pipe.process_image(img, "AttentionUNet", 0.5)
    assert pred in CLASSES
    assert 0.0 <= conf <= 100.0
    assert pred in text
    if pred == "COVID":
        assert overlay is not None and overlay.shape == img.shape
        assert "highlighted in red" in text
    else:
        assert overlay is None
        assert "Recommendation" in text


def test_pipeline_none_image():
    pipe = Pipeline(EvalConfig(weights_root="/nonexistent"))
    pred, conf, overlay, text = pipe.process_image(None, "AttentionUNet")
    assert pred == "No Image Uploaded" and overlay is None


def test_pipeline_missing_seg_weights_skips_segmentation(tmp_path, rng_np):
    _save_fresh_ckpt(tmp_path, "ResNet18", seg=False)
    pipe = Pipeline(EvalConfig(weights_root=str(tmp_path)))
    img = rng_np.integers(0, 256, (64, 64, 3), np.uint8)
    # Run several random images until one classifies as COVID (or give up).
    for seed in range(10):
        img = np.random.default_rng(seed).integers(0, 256, (64, 64, 3), np.uint8)
        pred, conf, overlay, text = pipe.process_image(img, "AttentionUNet")
        if pred == "COVID":
            assert overlay is None
            assert "WARNING: Segmentation model failed to load" in text
            break
