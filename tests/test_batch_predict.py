"""Batched offline inference: cascade over a directory."""

import csv

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

import jax

from medseg_tpu.core.config import EvalConfig
from medseg_tpu.core.registry import get_model
from medseg_tpu.infer.batch import batch_predict
from medseg_tpu.train import checkpoint as ckpt


def test_batch_predict_directory(tmp_path, rng_np):
    cv2 = pytest.importorskip("cv2")
    for name, seg in (("ResNet18", False), ("AttentionUNet", True)):
        model = get_model(name)["factory"]()
        variables = model.init(jax.random.key(0),
                               np.zeros((1, 64, 64, 3), np.float32))
        sub = "segmentation_models" if seg else "classification_models"
        ckpt.save_best(str(tmp_path / "w" / sub), name, seg,
                       variables["params"], variables.get("batch_stats", {}))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(5):
        arr = rng_np.integers(0, 256, (90, 110, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"x{i}.png"), arr[:, :, ::-1])

    out_dir = tmp_path / "out"
    results = batch_predict(
        [str(p) for p in sorted(img_dir.glob("*.png"))],
        cls_name="ResNet18", seg_name="AttentionUNet",
        cfg=EvalConfig(weights_root=str(tmp_path / "w")),
        batch_size=3, output_dir=str(out_dir), log=lambda *_: None)

    assert len(results) == 5
    for r in results:
        assert r["prediction"] in ("COVID", "Healthy", "Non-COVID")
        assert 0 <= r["confidence"] <= 100
        if r["prediction"] == "COVID":
            assert r["overlay_path"] and (tmp_path / "out").exists()

    with open(out_dir / "predictions.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5
    assert rows[0]["file"] == "x0.png"


def test_batch_predict_missing_cls_weights(tmp_path):
    with pytest.raises(FileNotFoundError):
        batch_predict(["nope.png"], cfg=EvalConfig(weights_root=str(tmp_path)),
                      log=lambda *_: None)
