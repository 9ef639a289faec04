"""Checkpoint-resume and data-parallel-mesh training tests."""

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

import jax

from medseg_tpu.core.config import AugmentConfig, TrainConfig
from medseg_tpu.data import BatchLoader, synthetic_cls
from medseg_tpu.parallel import data_parallel_mesh
from medseg_tpu.train import train_model

AUG = AugmentConfig(affine_p=0.0, brightness_contrast_p=0.0)


def test_resume_continues_from_saved_epoch(tmp_path):
    ds = synthetic_cls(n=16, img_size=32)
    tr = BatchLoader(ds, 8, shuffle=True, indices=np.arange(12))
    va = BatchLoader(ds, 4, shuffle=False, indices=np.arange(12, 16))
    cfg = TrainConfig(epochs=2, stage1_epochs=1, lr=1e-3, stage1_lr=1e-3,
                      save_root=str(tmp_path), compute_dtype="float32")
    logs1 = []
    train_model("ResNet18", tr, va, cfg, AUG, save=True, log=logs1.append)

    # extend epochs and resume: must start at epoch 3 in stage 2
    cfg2 = TrainConfig(epochs=4, stage1_epochs=1, lr=1e-3, stage1_lr=1e-3,
                       save_root=str(tmp_path), compute_dtype="float32")
    logs2 = []
    res = train_model("ResNet18", tr, va, cfg2, AUG, save=True, resume=True,
                      log=logs2.append)
    text = "\n".join(logs2)
    assert "Resumed ResNet18 from epoch 2" in text
    assert "Ep3" in text and "Ep1:" not in text
    assert "STAGE 1" not in text  # resumed straight into stage 2
    assert res.epochs_run == 4


def test_resume_across_stage_boundary(tmp_path):
    """Interrupt exactly after the last stage-1 epoch: the saved opt_state is
    the stage-1 masked tree, so resume must re-init the stage-2 optimizer
    instead of unflattening mismatched leaves (ADVICE r1, trainer.py)."""
    ds = synthetic_cls(n=16, img_size=32)
    tr = BatchLoader(ds, 8, shuffle=True, indices=np.arange(12))
    va = BatchLoader(ds, 4, shuffle=False, indices=np.arange(12, 16))
    cfg = TrainConfig(epochs=1, stage1_epochs=1, lr=1e-3, stage1_lr=1e-3,
                      save_root=str(tmp_path), compute_dtype="float32")
    train_model("ResNet18", tr, va, cfg, AUG, save=True, log=lambda s: None)

    cfg2 = TrainConfig(epochs=3, stage1_epochs=1, lr=1e-3, stage1_lr=1e-3,
                       save_root=str(tmp_path), compute_dtype="float32")
    logs = []
    res = train_model("ResNet18", tr, va, cfg2, AUG, save=True, resume=True,
                      log=logs.append)
    text = "\n".join(logs)
    assert "stage 1->2 boundary" in text
    assert "Ep2" in text and "Ep1:" not in text
    assert res.epochs_run == 3


def test_data_parallel_training_on_mesh(tmp_path):
    mesh = data_parallel_mesh()
    assert mesh.size >= 8
    ds = synthetic_cls(n=32, img_size=32)
    tr = BatchLoader(ds, 16, shuffle=True, indices=np.arange(24),
                     drop_last=True)
    va = BatchLoader(ds, 8, shuffle=False, indices=np.arange(24, 32))
    cfg = TrainConfig(epochs=1, stage1_epochs=1, lr=1e-3, stage1_lr=1e-3,
                      save_root=str(tmp_path), compute_dtype="float32")
    logs = []
    res = train_model("ResNet18", tr, va, cfg, AUG, save=False, mesh=mesh,
                      log=logs.append)
    assert res.epochs_run == 1
    assert np.isfinite(res.best_score)
