"""Metric functions reproducing the reference formulas exactly.

These formulas are the parity contract (reference utils/tester.py:49-193):

- Classification: sklearn-style accuracy / weighted precision / weighted
  recall / weighted F1 (+ per-class and confusion matrix), x100.  Implemented
  from the confusion matrix in numpy with zero_division=0 semantics so eval
  can run without sklearn; validated against sklearn in tests.
- Segmentation, per sample: IoU, Dice, pixel accuracy with 1e-7 smoothing,
  and TP/FP/FN-based precision/recall/F1.  The 0.5 threshold is applied to
  BOTH prediction and target (utils/tester.py:104-110), and metrics are
  averaged per-sample then over samples (utils/tester.py:281-299).

The segmentation metrics are jnp and batched so the whole test shard reduces
on device; a vmap over the batch gives the reference's per-sample-then-mean
semantics exactly.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

EPS = 1e-7


# --------------------------------------------------------------------------
# Classification (reference utils/tester.py:49-88)
# --------------------------------------------------------------------------

def confusion_matrix(labels, preds, num_classes: int) -> np.ndarray:
    """Rows = true class, cols = predicted class (sklearn convention)."""
    labels = np.asarray(labels).astype(np.int64)
    preds = np.asarray(preds).astype(np.int64)
    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    np.add.at(cm, (labels, preds), 1)
    return cm


def _safe_div(num, den):
    num = np.asarray(num, dtype=np.float64)
    den = np.asarray(den, dtype=np.float64)
    out = np.zeros_like(num)
    np.divide(num, den, out=out, where=den != 0)
    return out


def classification_metrics(preds, labels, num_classes: int = 3) -> Dict:
    """Accuracy, weighted/per-class precision-recall-F1, confusion matrix; x100.

    Matches sklearn's `average="weighted", zero_division=0` results
    (reference utils/tester.py:60-77) bit-for-bit on integer inputs.
    """
    cm = confusion_matrix(labels, preds, num_classes)
    support = cm.sum(axis=1)  # true count per class
    predicted = cm.sum(axis=0)  # predicted count per class
    tp = np.diag(cm).astype(np.float64)
    total = cm.sum()

    precision_c = _safe_div(tp, predicted)
    recall_c = _safe_div(tp, support)
    f1_c = _safe_div(2 * precision_c * recall_c, precision_c + recall_c)

    weights = _safe_div(support, total)
    accuracy = _safe_div(tp.sum(), total)
    precision = float((precision_c * weights).sum())
    recall = float((recall_c * weights).sum())
    f1 = float((f1_c * weights).sum())

    return {
        "accuracy": float(accuracy) * 100.0,
        "precision": precision * 100.0,
        "recall": recall * 100.0,
        "f1": f1 * 100.0,
        "precision_per_class": precision_c * 100.0,
        "recall_per_class": recall_c * 100.0,
        "f1_per_class": f1_c * 100.0,
        "confusion_matrix": cm,
    }


# --------------------------------------------------------------------------
# Segmentation (reference utils/tester.py:92-193)
# --------------------------------------------------------------------------

def segmentation_metrics_single(pred, target, threshold: float = 0.5) -> Dict[str, jnp.ndarray]:
    """All six segmentation metrics for ONE sample, as 0-d jnp arrays (x100).

    `pred` is the post-sigmoid probability map; both pred and target are
    binarized at `threshold` (utils/tester.py:104-110).  Shapes must match;
    any layout works because everything reduces over all elements.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    p = (pred > threshold).astype(jnp.float32)
    t = (target > threshold).astype(jnp.float32)

    inter = (p * t).sum()
    union = ((p + t) > 0).astype(jnp.float32).sum()
    psum = p.sum()
    tsum = t.sum()

    iou = (inter + EPS) / (union + EPS)
    dice = (2.0 * inter + EPS) / (psum + tsum + EPS)
    pixel_acc = (p == t).astype(jnp.float32).sum() / p.size

    tp = inter
    fp = (p * (1.0 - t)).sum()
    fn = ((1.0 - p) * t).sum()
    precision = (tp + EPS) / (tp + fp + EPS)
    recall = (tp + EPS) / (tp + fn + EPS)
    f1 = 2.0 * (precision * recall) / (precision + recall + EPS)

    return {
        "iou": iou * 100.0,
        "dice": dice * 100.0,
        "pixel_accuracy": pixel_acc * 100.0,
        "precision": precision * 100.0,
        "recall": recall * 100.0,
        "f1": f1 * 100.0,
    }


def segmentation_metrics_batched(pred, target, threshold: float = 0.5) -> Dict[str, jnp.ndarray]:
    """Per-sample metrics over a batch: each value is a (B,) vector (x100).

    Reduces over all non-batch axes, exactly equivalent to looping
    `segmentation_metrics_single` over the batch (utils/tester.py:281-289)
    but compiled as one fused reduction on device.
    """
    B = pred.shape[0]
    pred = pred.reshape(B, -1).astype(jnp.float32)
    target = target.reshape(B, -1).astype(jnp.float32)
    p = (pred > threshold).astype(jnp.float32)
    t = (target > threshold).astype(jnp.float32)

    inter = (p * t).sum(axis=1)
    union = ((p + t) > 0).astype(jnp.float32).sum(axis=1)
    psum = p.sum(axis=1)
    tsum = t.sum(axis=1)

    iou = (inter + EPS) / (union + EPS)
    dice = (2.0 * inter + EPS) / (psum + tsum + EPS)
    pixel_acc = (p == t).astype(jnp.float32).sum(axis=1) / p.shape[1]

    tp = inter
    fp = (p * (1.0 - t)).sum(axis=1)
    fn = ((1.0 - p) * t).sum(axis=1)
    precision = (tp + EPS) / (tp + fp + EPS)
    recall = (tp + EPS) / (tp + fn + EPS)
    f1 = 2.0 * (precision * recall) / (precision + recall + EPS)

    return {
        "iou": iou * 100.0,
        "dice": dice * 100.0,
        "pixel_accuracy": pixel_acc * 100.0,
        "precision": precision * 100.0,
        "recall": recall * 100.0,
        "f1": f1 * 100.0,
    }


def average_segmentation_metrics(per_sample: Dict[str, np.ndarray], valid_mask=None) -> Dict[str, float]:
    """Mean over samples, optionally masking out padded rows from sharded eval."""
    out = {}
    for k, v in per_sample.items():
        v = np.asarray(v, dtype=np.float64)
        if valid_mask is not None:
            m = np.asarray(valid_mask, dtype=bool)
            v = v[m]
        out[k] = float(v.mean())
    return out
