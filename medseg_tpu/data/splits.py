"""Stratified split generation reproducing the reference's determinism contract.

Contract (reference utils/split_dataset.py:39-99,142-149): collect image ids
per class directory, then two chained sklearn train_test_split calls with
stratify and random_state=42 — first carving out 20% (val+test), then halving
it.  Using sklearn directly (it is a framework dependency of the eval
harness' oracle tests anyway) guarantees the same ids land in the same
splits, so `results/*.csv` replay is apples-to-apples.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Sequence

import numpy as np
import pandas as pd

from medseg_tpu.core.config import CLASSES, DataConfig


def collect_image_ids(data_root: str, classes: Sequence[str] = CLASSES):
    """(ids, labels) from dataset/<class>/images/*.png (split_dataset.py:19-36)."""
    ids, labels = [], []
    for cls in classes:
        img_dir = Path(data_root) / cls / "images"
        if not img_dir.is_dir():
            print(f"Warning: Image directory not found: {img_dir}")
            continue
        for f in sorted(img_dir.glob("*.png")):
            ids.append(f.stem)
            labels.append(cls)
    return np.asarray(ids), np.asarray(labels)


def stratified_split(ids, labels, train_ratio=0.8, val_ratio=0.1,
                     test_ratio=0.1, seed=42):
    """Two chained stratified splits, sklearn semantics, seed 42."""
    from sklearn.model_selection import train_test_split

    assert abs(train_ratio + val_ratio + test_ratio - 1.0) < 1e-6
    temp_ratio = val_ratio + test_ratio
    train_ids, temp_ids, train_y, temp_y = train_test_split(
        ids, labels, test_size=temp_ratio, stratify=labels, random_state=seed)
    val_size = val_ratio / temp_ratio
    val_ids, test_ids, val_y, test_y = train_test_split(
        temp_ids, temp_y, test_size=(1 - val_size), stratify=temp_y,
        random_state=seed)
    return (train_ids, train_y), (val_ids, val_y), (test_ids, test_y)


def write_split_csvs(splits, out_dir: str):
    """id,class CSVs named train/val/test.csv (split_dataset.py:102-130)."""
    os.makedirs(out_dir, exist_ok=True)
    for name, (ids, labels) in zip(("train", "val", "test"), splits):
        pd.DataFrame({"id": ids, "class": labels}).to_csv(
            Path(out_dir) / f"{name}.csv", index=False)


def print_split_summary(splits, classes: Sequence[str] = CLASSES):
    """Per-split sizes and class distribution (split_dataset.py:81-97)."""
    total = sum(len(ids) for ids, _ in splits)
    print("\nSplit summary:")
    for name, (ids, labels) in zip(("Train", "Validation", "Test"), splits):
        print(f"{name}: {len(ids)} images ({len(ids) / total * 100:.1f}%)")
    print("\nClass distribution:")
    for name, (ids, labels) in zip(("Train", "Validation", "Test"), splits):
        print(f"\n{name}:")
        for cls in classes:
            count = int(np.sum(labels == cls))
            pct = count / len(labels) * 100 if len(labels) else 0
            print(f"  {cls}: {count} ({pct:.1f}%)")


def generate_splits(cfg: DataConfig = DataConfig()):
    ids, labels = collect_image_ids(cfg.root, cfg.classes)
    if len(ids) == 0:
        raise ValueError("No images found in the dataset!")
    print(f"Total images found: {len(ids)}")
    splits = stratified_split(ids, labels, cfg.train_ratio, cfg.val_ratio,
                              cfg.test_ratio, cfg.seed)
    print_split_summary(splits, cfg.classes)
    write_split_csvs(splits, cfg.splits_dir)
    return splits
