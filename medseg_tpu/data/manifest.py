"""Split-CSV manifests: which files belong to which split.

Mirrors the reference Dataset constructors' CSV protocol
(utils/dataset.py:24-98): rows are (id, class); classification keeps samples
whose image exists; segmentation keeps pairs where BOTH image and mask exist.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional

import pandas as pd

from medseg_tpu.core.config import DataConfig


@dataclasses.dataclass
class Sample:
    image_path: Path
    label: int
    mask_path: Optional[Path] = None


def load_manifest(cfg: DataConfig, split: str, require_mask: bool = False) -> List[Sample]:
    csv_path = cfg.split_csv(split)
    if not csv_path.exists():
        raise FileNotFoundError(f"Split file not found: {csv_path}")
    df = pd.read_csv(csv_path)
    root = Path(cfg.root)
    samples: List[Sample] = []
    for _, row in df.iterrows():
        cls = row["class"]
        img = root / cls / "images" / f"{row['id']}.png"
        mask = root / cls / "masks" / f"{row['id']}.png"
        if not img.exists():
            continue
        if require_mask and not mask.exists():
            continue
        samples.append(Sample(img, list(cfg.classes).index(cls),
                              mask if mask.exists() else None))
    return samples
