"""Parity-replay harness tests against the reference's published CSVs."""

import pandas as pd
import pytest

from medseg_tpu.eval.parity import compare_results_csv, format_parity_report

REF_CLS = "/root/reference/results/classification_test_results.csv"
REF_SEG = "/root/reference/results/segmentation_test_results.csv"


def test_reference_vs_itself_is_exact():
    report = compare_results_csv(REF_CLS, REF_CLS)
    assert report["within_tolerance"]
    assert report["max_abs_delta"] == 0.0
    assert set(report["models"]) == {"ResNet18", "ResNet50", "VGG16", "VGG19", "CLIP"}


def test_detects_metric_drift(tmp_path):
    df = pd.read_csv(REF_SEG)
    df.loc[df.Model == "ResNetUnet", "dice"] += 1.0
    p = tmp_path / "ours.csv"
    df.to_csv(p, index=False)
    report = compare_results_csv(str(p), REF_SEG, tolerance=0.5)
    assert not report["within_tolerance"]
    assert report["max_abs_delta"] == pytest.approx(1.0)
    o, r, d = report["models"]["ResNetUnet"]["dice"]
    assert d == pytest.approx(1.0)


def test_detects_missing_model(tmp_path):
    df = pd.read_csv(REF_CLS)
    df = df[df.Model != "CLIP"]
    p = tmp_path / "ours.csv"
    df.to_csv(p, index=False)
    report = compare_results_csv(str(p), REF_CLS)
    assert report["missing_models"] == ["CLIP"]
    assert not report["within_tolerance"]


def test_report_formats(capsys, tmp_path):
    lines = []
    report = compare_results_csv(REF_CLS, REF_CLS)
    format_parity_report(report, log=lines.append)
    assert any("ResNet18" in l for l in lines)
    assert any("within tolerance: True" in l for l in lines)
