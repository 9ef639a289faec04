"""Eval harness tests: end-to-end metric flow, reference-weight loading,
CSV schema parity, skip-on-missing behavior."""

import numpy as np
import pandas as pd
import pytest

import jax

from medseg_tpu.core.config import EvalConfig
from medseg_tpu.core.registry import get_model
from medseg_tpu.data import BatchLoader, synthetic_cls, synthetic_seg
from medseg_tpu.eval import (
    evaluate_model,
    print_summary,
    save_results_to_csv,
)
from medseg_tpu.eval import test_all_models as run_all_models

run_all_models.__name__ = 'run_all_models'  # keep pytest from collecting it


def test_evaluate_classification_with_given_variables():
    ds = synthetic_cls(n=10, img_size=32)
    loader = BatchLoader(ds, 4, shuffle=False)
    model = get_model("ResNet18")["factory"]()
    variables = model.init(jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32))
    res = evaluate_model("ResNet18", loader, variables, log=lambda *_: None)
    for k in ("accuracy", "precision", "recall", "f1", "confusion_matrix"):
        assert k in res
    assert res["confusion_matrix"].sum() == 10


def test_evaluate_segmentation_with_given_variables():
    ds = synthetic_seg(n=6, img_size=32)
    loader = BatchLoader(ds, 3, shuffle=False)
    model = get_model("AttentionUNet")["factory"]()
    variables = model.init(jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32))
    res = evaluate_model("AttentionUNet", loader, variables, log=lambda *_: None)
    for k in ("iou", "dice", "pixel_accuracy", "precision", "recall", "f1"):
        assert 0.0 <= res[k] <= 100.0


def test_missing_weights_are_skipped(tmp_path):
    ds = synthetic_cls(n=4, img_size=32)
    loader = BatchLoader(ds, 4, shuffle=False)
    logs = []
    res = evaluate_model("ResNet18", loader, None,
                         EvalConfig(weights_root=str(tmp_path)),
                         log=logs.append)
    assert res is None
    assert any("Weights not found" in l for l in logs)


def test_torch_reference_checkpoint_loads(tmp_path):
    """A reference-format .pt state_dict is found and converted on the fly."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracles import TResNet, randomize_bn_stats

    tm = randomize_bn_stats(TResNet(18)).eval()
    wdir = tmp_path / "classification_models"
    wdir.mkdir(parents=True)
    torch.save(tm.state_dict(), wdir / "ResNet18_best_acc.pt")

    ds = synthetic_cls(n=6, img_size=32)
    loader = BatchLoader(ds, 3, shuffle=False)
    res = evaluate_model("ResNet18", loader, None,
                         EvalConfig(weights_root=str(tmp_path)),
                         log=lambda *_: None)
    assert res is not None and res["confusion_matrix"].sum() == 6


def test_csv_schema_matches_reference(tmp_path):
    results = {
        "ResNet18": {"accuracy": 96.8, "precision": 96.8, "recall": 96.8,
                     "f1": 96.8, "confusion_matrix": np.eye(3),
                     "precision_per_class": np.ones(3),
                     "recall_per_class": np.ones(3),
                     "f1_per_class": np.ones(3)},
        "ResNetUnet": {"iou": 96.5, "dice": 98.2, "pixel_accuracy": 99.1,
                       "precision": 97.8, "recall": 98.6, "f1": 98.2},
    }
    cls_path = tmp_path / "cls.csv"
    seg_path = tmp_path / "seg.csv"
    save_results_to_csv(results, str(cls_path), str(seg_path),
                        log=lambda *_: None)
    cls_df = pd.read_csv(cls_path)
    assert list(cls_df.columns) == ["Model", "accuracy", "precision", "recall", "f1"]
    seg_df = pd.read_csv(seg_path)
    assert list(seg_df.columns) == [
        "Model", "iou", "dice", "pixel_accuracy", "precision", "recall", "f1"]
    # Same schema as the reference's published ground-truth CSVs.
    ref = pd.read_csv("/root/reference/results/segmentation_test_results.csv")
    assert list(seg_df.columns) == list(ref.columns)
    ref_cls = pd.read_csv("/root/reference/results/classification_test_results.csv")
    assert list(cls_df.columns) == list(ref_cls.columns)


def test_print_summary_formats(capsys):
    results = {
        "ResNet18": {"accuracy": 96.83, "precision": 96.84, "recall": 96.83,
                     "f1": 96.82},
        "ResNetUnet": {"iou": 96.58, "dice": 98.23, "pixel_accuracy": 99.17,
                       "precision": 97.86, "recall": 98.65, "f1": 98.23},
    }
    lines = []
    print_summary(results, log=lines.append)
    text = "\n".join(lines)
    assert "TEST RESULTS SUMMARY" in text
    assert "Best Classification Model: ResNet18" in text
    assert "Best Segmentation Model: ResNetUnet" in text


def test_all_models_skips_everything_without_weights(tmp_path):
    ds = synthetic_cls(n=4, img_size=32)
    loader = BatchLoader(ds, 4, shuffle=False)
    res = run_all_models(loader, None, EvalConfig(weights_root=str(tmp_path)),
                          log=lambda *_: None)
    assert res == {}
