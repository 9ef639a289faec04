"""Result CSV export in the reference's exact schema.

Reference utils/tester.py:808-876: classification rows drop the confusion
matrix and per-class vectors; column order follows metric-dict insertion
(Model, accuracy, precision, recall, f1 / Model, iou, dice, pixel_accuracy,
precision, recall, f1) — matching results/*.csv headers, the parity ground
truth.
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import pandas as pd

_CLS_DROP = ("confusion_matrix", "precision_per_class", "recall_per_class",
             "f1_per_class")


def save_results_to_csv(
    results: Dict[str, Dict],
    cls_output_path: str = "results/classification_test_results.csv",
    seg_output_path: str = "results/segmentation_test_results.csv",
    log: Callable[[str], None] = print,
):
    if not results:
        log("\n[INFO] No results to save.")
        return
    cls_models = [k for k in results
                  if any(x in k for x in ("ResNet18", "ResNet50", "VGG", "CLIP"))
                  and "Seg" not in k]
    seg_models = [k for k in results
                  if "Unet" in k or "UNet" in k or "CLIPSeg" in k]

    if cls_models:
        rows = []
        for name in cls_models:
            row = {"Model": name}
            row.update({k: v for k, v in results[name].items()
                        if k not in _CLS_DROP})
            rows.append(row)
        os.makedirs(os.path.dirname(cls_output_path) or ".", exist_ok=True)
        pd.DataFrame(rows).to_csv(cls_output_path, index=False)
        log(f"\n[INFO] Classification results saved to: {cls_output_path}")
    else:
        log("\n[INFO] No classification results to save.")

    if seg_models:
        rows = []
        for name in seg_models:
            row = {"Model": name}
            row.update(results[name])
            rows.append(row)
        os.makedirs(os.path.dirname(seg_output_path) or ".", exist_ok=True)
        pd.DataFrame(rows).to_csv(seg_output_path, index=False)
        log(f"[INFO] Segmentation results saved to: {seg_output_path}")
    else:
        log("\n[INFO] No segmentation results to save.")
