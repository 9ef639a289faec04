"""Learning tests: the training recipes actually reduce loss / fit data.

These catch wiring bugs (dead gradients, wrong masks, broken BN) that shape
tests cannot.  Thresholds are deliberately loose; datasets are tiny and
class-separable by construction.
"""

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

from medseg_tpu.core.config import AugmentConfig, TrainConfig
from medseg_tpu.data import BatchLoader, synthetic_cls, synthetic_seg
from medseg_tpu.train import train_model

AUG = AugmentConfig(affine_p=0.0, brightness_contrast_p=0.0, hflip_p=0.0)


def test_two_stage_classifier_fits_separable_data(tmp_path):
    ds = synthetic_cls(n=48, img_size=32, seed=3)
    tr = BatchLoader(ds, 16, shuffle=True, indices=np.arange(36))
    va = BatchLoader(ds, 12, shuffle=False, indices=np.arange(36, 48))
    cfg = TrainConfig(epochs=6, stage1_epochs=2, lr=3e-3, stage1_lr=3e-3,
                      save_root=str(tmp_path), compute_dtype="float32",
                      dropout=0.0)
    logs = []
    res = train_model("ResNet18", tr, va, cfg, AUG, save=False,
                      log=logs.append)
    # mean intensity encodes the class; a trained net must beat chance hard
    assert res.best_score > 60.0, "\n".join(logs)


def test_segmentation_loss_decreases(tmp_path):
    ds = synthetic_seg(n=12, img_size=32, seed=4)
    tr = BatchLoader(ds, 6, shuffle=True, indices=np.arange(9))
    va = BatchLoader(ds, 3, shuffle=False, indices=np.arange(9, 12))
    cfg = TrainConfig(epochs=4, lr=3e-3, save_root=str(tmp_path),
                      compute_dtype="float32")
    logs = []
    train_model("AttentionUNet", tr, va, cfg, AUG, save=False,
                log=logs.append)
    losses = []
    for l in logs:
        if "TrainLoss" in l:
            losses.append(float(l.split("TrainLoss ")[1].split(" ")[0]))
    assert len(losses) == 4
    assert losses[-1] < losses[0], losses
