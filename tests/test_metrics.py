"""Golden tests: metric formulas vs sklearn and vs the reference's exact
torch formulas re-expressed in numpy (reference utils/tester.py:49-193)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from medseg_tpu.eval import metrics as M


def _ref_seg_metrics(pred, target, threshold=0.5):
    """Reference formulas (utils/tester.py:92-193) in numpy, one sample."""
    p = (pred > threshold).astype(np.float64)
    t = (target > threshold).astype(np.float64)
    inter = (p * t).sum()
    union = ((p + t) > 0).sum()
    iou = (inter + 1e-7) / (union + 1e-7)
    dice = (2 * inter + 1e-7) / (p.sum() + t.sum() + 1e-7)
    pix = (p == t).sum() / p.size
    tp = inter
    fp = (p * (1 - t)).sum()
    fn = ((1 - p) * t).sum()
    prec = (tp + 1e-7) / (tp + fp + 1e-7)
    rec = (tp + 1e-7) / (tp + fn + 1e-7)
    f1 = 2 * prec * rec / (prec + rec + 1e-7)
    return dict(iou=iou * 100, dice=dice * 100, pixel_accuracy=pix * 100,
                precision=prec * 100, recall=rec * 100, f1=f1 * 100)


def test_classification_metrics_vs_sklearn(rng_np):
    sklearn = pytest.importorskip("sklearn.metrics")
    labels = rng_np.integers(0, 3, size=500)
    preds = labels.copy()
    flip = rng_np.random(500) < 0.15
    preds[flip] = rng_np.integers(0, 3, size=flip.sum())

    got = M.classification_metrics(preds, labels, num_classes=3)
    assert got["accuracy"] == pytest.approx(
        sklearn.accuracy_score(labels, preds) * 100, abs=1e-10)
    assert got["precision"] == pytest.approx(
        sklearn.precision_score(labels, preds, average="weighted", zero_division=0) * 100,
        abs=1e-10)
    assert got["recall"] == pytest.approx(
        sklearn.recall_score(labels, preds, average="weighted", zero_division=0) * 100,
        abs=1e-10)
    assert got["f1"] == pytest.approx(
        sklearn.f1_score(labels, preds, average="weighted", zero_division=0) * 100,
        abs=1e-10)
    np.testing.assert_array_equal(
        got["confusion_matrix"], sklearn.confusion_matrix(labels, preds))
    np.testing.assert_allclose(
        got["precision_per_class"],
        sklearn.precision_score(labels, preds, average=None, zero_division=0) * 100,
        atol=1e-10)


def test_classification_metrics_missing_class():
    # A class never predicted: zero_division=0 semantics.
    labels = np.array([0, 0, 1, 1, 2, 2])
    preds = np.array([0, 0, 0, 0, 0, 0])
    got = M.classification_metrics(preds, labels, num_classes=3)
    assert got["precision_per_class"][1] == 0.0
    assert got["recall_per_class"][1] == 0.0
    assert got["accuracy"] == pytest.approx(100 / 3)


@pytest.mark.parametrize("case", ["random", "empty_both", "empty_pred", "full"])
def test_segmentation_metrics_golden(case, rng_np):
    h = w = 32
    if case == "random":
        pred = rng_np.random((h, w)).astype(np.float32)
        target = (rng_np.random((h, w)) > 0.5).astype(np.float32)
    elif case == "empty_both":
        pred = np.zeros((h, w), np.float32)
        target = np.zeros((h, w), np.float32)
    elif case == "empty_pred":
        pred = np.zeros((h, w), np.float32)
        target = np.ones((h, w), np.float32)
    else:
        pred = np.ones((h, w), np.float32)
        target = np.ones((h, w), np.float32)

    want = _ref_seg_metrics(pred, target)
    got = {k: float(v) for k, v in M.segmentation_metrics_single(
        jnp.asarray(pred), jnp.asarray(target)).items()}
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-5), k


def test_segmentation_metrics_batched_matches_loop(rng_np):
    b, h, w = 4, 16, 16
    pred = rng_np.random((b, h, w)).astype(np.float32)
    target = (rng_np.random((b, h, w)) > 0.6).astype(np.float32)
    batched = {k: np.asarray(v) for k, v in M.segmentation_metrics_batched(
        jnp.asarray(pred), jnp.asarray(target)).items()}
    for i in range(b):
        single = M.segmentation_metrics_single(jnp.asarray(pred[i]), jnp.asarray(target[i]))
        for k in batched:
            assert batched[k][i] == pytest.approx(float(single[k]), rel=1e-5)
    # per-sample-then-mean averaging (utils/tester.py:281-299)
    avg = M.average_segmentation_metrics(batched)
    assert avg["dice"] == pytest.approx(np.mean(batched["dice"]), rel=1e-7)


def test_average_respects_padding_mask(rng_np):
    vals = {"dice": np.array([10.0, 20.0, 999.0])}
    avg = M.average_segmentation_metrics(vals, valid_mask=[True, True, False])
    assert avg["dice"] == pytest.approx(15.0)
