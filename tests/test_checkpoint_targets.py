"""Abstract-target orbax restore: warning-free, round-trips, rejects mismatch.

r4 VERDICT item 5: target-less StandardCheckpointer.restore emitted the
'generally UNSAFE' warning on every resume path, and a topology change
surfaced as a corrupt tree instead of a clean error.  Restores now always
pass an abstract target (derived from checkpoint metadata, or enforced from
a caller-provided tree), and the trainer validates the restored params tree
against the live model before touching it.
"""

import json
import warnings
from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp
import pytest

from medseg_tpu.core.config import AugmentConfig, TrainConfig
from medseg_tpu.data import BatchLoader, synthetic_cls
from medseg_tpu.train import checkpoint as ckpt
from medseg_tpu.train import train_model

TREE_PARAMS = {"conv": {"kernel": np.arange(12, dtype=np.float32).reshape(2, 2, 3)},
               "dense": {"bias": np.ones((4,), np.float32)}}
TREE_STATS = {"bn": {"mean": np.zeros((3,), np.float32)}}


def test_load_best_is_warning_free_and_round_trips(tmp_path):
    ckpt.save_best(str(tmp_path), "Toy", seg=False,
                   params=TREE_PARAMS, batch_stats=TREE_STATS,
                   aux={"text": np.ones((2, 8), np.float32)})
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any orbax UNSAFE/sharding warning fails
        tree = ckpt.load_best(str(tmp_path), "Toy", seg=False)
    np.testing.assert_array_equal(tree["params"]["conv"]["kernel"],
                                  TREE_PARAMS["conv"]["kernel"])
    np.testing.assert_array_equal(tree["batch_stats"]["bn"]["mean"],
                                  TREE_STATS["bn"]["mean"])
    assert tree["aux"]["text"].shape == (2, 8)


def test_load_best_with_explicit_target_enforces_structure(tmp_path):
    ckpt.save_best(str(tmp_path), "Toy", seg=True,
                   params=TREE_PARAMS, batch_stats=TREE_STATS)
    good = {"params": TREE_PARAMS, "batch_stats": TREE_STATS}
    tree = ckpt.load_best(str(tmp_path), "Toy", seg=True, target=good)
    np.testing.assert_array_equal(tree["params"]["dense"]["bias"],
                                  TREE_PARAMS["dense"]["bias"])

    bad = {"params": {"conv": {"kernel": np.empty((2, 2, 3), np.float32)}},
           "batch_stats": TREE_STATS}  # missing dense branch
    with pytest.raises(ValueError):
        ckpt.load_best(str(tmp_path), "Toy", seg=True, target=bad)


def test_load_resume_is_warning_free(tmp_path):
    class FakeState:
        params = TREE_PARAMS
        batch_stats = TREE_STATS
        opt_state = {"mu": TREE_PARAMS}
        step = np.asarray(7)

    ckpt.save_resume(str(tmp_path), "Toy", FakeState(), epoch=3, best_score=0.5)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tree, meta = ckpt.load_resume(str(tmp_path), "Toy")
    assert meta["epoch"] == 3
    assert int(tree["step"]) == 7


def test_trainer_rejects_foreign_resume_checkpoint(tmp_path):
    """A resume checkpoint whose params tree doesn't match the model must
    raise a clean error, not a corrupt unflatten downstream."""
    cfg = TrainConfig(epochs=2, stage1_epochs=1, lr=1e-3, stage1_lr=1e-3,
                      save_root=str(tmp_path), compute_dtype="float32")
    save_dir = Path(str(cfg.cls_save_dir))
    save_dir.mkdir(parents=True, exist_ok=True)
    path = (save_dir / "ResNet18_resume").absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": {"not_resnet": np.zeros((2,), np.float32)},
                      "batch_stats": {},
                      "opt_state": {"mu": np.zeros((2,), np.float32)},
                      "step": np.asarray(1)}, force=True)
    ckptr.wait_until_finished()
    (path / "meta.json").write_text(json.dumps(
        {"epoch": 1, "best_score": 0.0, "stage": 1}))

    ds = synthetic_cls(n=8, img_size=32)
    tr = BatchLoader(ds, 4, shuffle=True, indices=np.arange(6))
    va = BatchLoader(ds, 2, shuffle=False, indices=np.arange(6, 8))
    aug = AugmentConfig(affine_p=0.0, brightness_contrast_p=0.0)
    with pytest.raises(ValueError, match="does not match model"):
        train_model("ResNet18", tr, va, cfg, aug, save=True, resume=True,
                    log=lambda s: None)
