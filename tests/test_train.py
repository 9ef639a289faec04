"""Training-engine tests: schedules vs torch semantics, freeze masks,
and an end-to-end smoke train on synthetic data (SURVEY.md §4)."""

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from medseg_tpu.core.config import AugmentConfig, TrainConfig
from medseg_tpu.data import BatchLoader, synthetic_cls, synthetic_seg
from medseg_tpu.train import (
    ReduceLROnPlateau,
    cosine_annealing,
    cross_entropy,
    bce_with_logits,
    dice_loss,
    head_only,
    mask_from_predicate,
    steps as S,
    train_model,
)


def test_cosine_matches_torch():
    torch = pytest.importorskip("torch")
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-4)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=5)
    for ep in range(5):
        want = opt.param_groups[0]["lr"]
        got = cosine_annealing(1e-4, ep, 5)
        assert got == pytest.approx(want, rel=1e-9)
        opt.step()
        sch.step()


def test_plateau_matches_torch():
    torch = pytest.importorskip("torch")
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-3)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.1, patience=3)
    ours = ReduceLROnPlateau(1e-3, "max", 0.1, 3)
    scores = [0.5, 0.6, 0.6, 0.6, 0.6, 0.6, 0.7, 0.7, 0.7, 0.7, 0.7, 0.2]
    for s in scores:
        sch.step(s)
        got = ours.step(s)
        assert got == pytest.approx(opt.param_groups[0]["lr"], rel=1e-9), s


def test_losses_match_torch(rng_np):
    torch = pytest.importorskip("torch")
    logits = rng_np.standard_normal((8, 3)).astype(np.float32)
    labels = rng_np.integers(0, 3, 8)
    want = torch.nn.CrossEntropyLoss(label_smoothing=0.1)(
        torch.from_numpy(logits), torch.from_numpy(labels))
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1)
    assert float(got) == pytest.approx(float(want), rel=1e-5)

    seg_logits = rng_np.standard_normal((2, 8, 8, 1)).astype(np.float32)
    seg_targets = (rng_np.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(
        torch.from_numpy(seg_logits), torch.from_numpy(seg_targets))
    got = bce_with_logits(jnp.asarray(seg_logits), jnp.asarray(seg_targets))
    assert float(got) == pytest.approx(float(want), rel=1e-5)

    # Dice loss formula (clip_seg_finetuner.py:40-58)
    p = 1 / (1 + np.exp(-seg_logits.reshape(-1)))
    t = seg_targets.reshape(-1)
    want_dice = 1 - (2 * (p * t).sum() + 1) / (p.sum() + t.sum() + 1)
    got = dice_loss(jnp.asarray(seg_logits), jnp.asarray(seg_targets))
    assert float(got) == pytest.approx(float(want_dice), rel=1e-5)


def test_freeze_mask_and_decay():
    """Masked (frozen) params receive no update — including weight decay."""
    params = {"head": {"fc": {"kernel": jnp.ones((2, 2))}},
              "encoder": {"conv": {"kernel": jnp.ones((2, 2))}}}
    mask = mask_from_predicate(params, lambda p: p[0] == "head")
    assert mask["head"]["fc"]["kernel"] is True
    assert mask["encoder"]["conv"]["kernel"] is False
    opt = S.build_optimizer(0.1, 0.5, 1.0, mask)
    opt_state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, opt_state, params)
    import optax
    new = optax.apply_updates(params, updates)
    assert np.all(np.asarray(new["encoder"]["conv"]["kernel"]) == 1.0)
    assert np.all(np.asarray(new["head"]["fc"]["kernel"]) != 1.0)


def test_set_learning_rate_no_recompile():
    params = {"w": jnp.ones((2,))}
    opt = S.build_optimizer(1e-3, 0.0, 1.0, {"w": True})
    st = opt.init(params)
    st = S.set_learning_rate(st, 5e-4)
    assert S.get_learning_rate(st) == pytest.approx(5e-4)



def test_smoke_train_classification(tmp_path):
    """2-image-class separable synthetic set: two-stage trainer must reach
    high train accuracy and emit a best checkpoint."""
    ds = synthetic_cls(n=32, img_size=32)
    train_loader = BatchLoader(ds, 8, shuffle=True, seed=0,
                               indices=np.arange(24))
    val_loader = BatchLoader(ds, 8, shuffle=False, indices=np.arange(24, 32))
    cfg = TrainConfig(epochs=3, stage1_epochs=2, lr=1e-3, stage1_lr=1e-3,
                      save_root=str(tmp_path), compute_dtype="float32")
    logs = []
    res = train_model("ResNet18", train_loader, val_loader, cfg,
                      AugmentConfig(affine_p=0.0, brightness_contrast_p=0.0),
                      save=True, log=logs.append)
    assert res.epochs_run == 3
    assert any("STAGE 2" in l for l in logs)
    from medseg_tpu.train import checkpoint as ckpt
    assert ckpt.best_exists(str(cfg.cls_save_dir), "ResNet18", seg=False)
    restored = ckpt.load_best(str(cfg.cls_save_dir), "ResNet18", seg=False)
    assert "params" in restored and "batch_stats" in restored



def test_smoke_train_segmentation(tmp_path):
    ds = synthetic_seg(n=8, img_size=32)
    train_loader = BatchLoader(ds, 4, shuffle=True, indices=np.arange(6))
    val_loader = BatchLoader(ds, 4, shuffle=False, indices=np.arange(6, 8))
    cfg = TrainConfig(epochs=2, lr=1e-3, save_root=str(tmp_path),
                      compute_dtype="float32")
    logs = []
    res = train_model("AttentionUNet", train_loader, val_loader, cfg,
                      save=False, log=logs.append)
    assert res.epochs_run == 2
    assert any("IoU" in l for l in logs)
    assert np.isfinite(res.best_score)
