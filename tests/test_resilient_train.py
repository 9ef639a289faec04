"""Automatic restart on transient runtime failures (train_model_resilient).

The tunneled TPU runtime can kill a training run with a transport-level
JaxRuntimeError (observed on hardware: "INTERNAL: .../remote_compile: read
body: response body closed before all bytes were read" at a stage-2 first
compile).  The recovery path re-enters train_model(resume=True) from the last
epoch's resume checkpoint.  These tests inject that failure into a real tiny
training run and check classification of retryable vs. permanent errors.
"""

import numpy as np
import pytest

# heavy e2e/learning/interop module — excluded from the fast dev tier
# (pytest -m 'not slow'); the full unmarked run stays the bar (r5)
pytestmark = pytest.mark.slow

import jax

from medseg_tpu.core.config import AugmentConfig, TrainConfig
from medseg_tpu.data import BatchLoader, synthetic_cls
from medseg_tpu.train import trainer
from medseg_tpu.train import steps as S
from medseg_tpu.train.trainer import (is_transient_runtime_error,
                                      train_model_resilient)

AUG = AugmentConfig(affine_p=0.0, brightness_contrast_p=0.0)

TRANSIENT_MSG = ("INTERNAL: http://127.0.0.1:8093/remote_compile: read body: "
                 "response body closed before all bytes were read")


def _loaders():
    ds = synthetic_cls(n=16, img_size=32)
    tr = BatchLoader(ds, 8, shuffle=True, indices=np.arange(12))
    va = BatchLoader(ds, 4, shuffle=False, indices=np.arange(12, 16))
    return tr, va


def test_transient_classification():
    mk = jax.errors.JaxRuntimeError
    assert is_transient_runtime_error(mk(TRANSIENT_MSG))
    assert is_transient_runtime_error(mk("UNAVAILABLE: socket idle"))
    assert is_transient_runtime_error(mk("DEADLINE_EXCEEDED: step"))
    # real OOMs and program bugs re-fail forever -> never retried
    assert not is_transient_runtime_error(mk("RESOURCE_EXHAUSTED: 34GB"))
    assert not is_transient_runtime_error(mk("INTERNAL: Mosaic lowering"))
    # non-runtime errors are never transient, whatever the text
    assert not is_transient_runtime_error(ValueError("remote_compile"))


def test_restarts_from_resume_after_midrun_failure(tmp_path, monkeypatch):
    """Kill the first train step of epoch 2 with the on-hardware transport
    error; the wrapper must resume from epoch 1's checkpoint and finish."""
    real_make = S.make_cls_train_step
    calls = {"n": 0, "armed": True}

    def flaky_make(*a, **k):
        step = real_make(*a, **k)

        def wrapped(*sa, **sk):
            calls["n"] += 1
            if calls["armed"] and calls["n"] == 3:  # 2 steps/epoch -> ep2 step1
                calls["armed"] = False
                raise jax.errors.JaxRuntimeError(TRANSIENT_MSG)
            return step(*sa, **sk)

        return wrapped

    monkeypatch.setattr(S, "make_cls_train_step", flaky_make)
    tr, va = _loaders()
    cfg = TrainConfig(epochs=2, stage1_epochs=2, lr=1e-3, stage1_lr=1e-3,
                      save_root=str(tmp_path), compute_dtype="float32")
    logs = []
    res = train_model_resilient("ResNet18", tr, va, cfg, AUG, save=True,
                                log=logs.append)
    text = "\n".join(logs)
    assert "transient runtime failure" in text
    assert "Resumed ResNet18 from epoch 1" in text
    assert not calls["armed"]
    assert res.epochs_run == 2


def test_permanent_failure_reraises_without_restart(monkeypatch):
    calls = {"n": 0}

    def broken_train_model(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("INTERNAL: Mosaic lowering failed")

    monkeypatch.setattr(trainer, "train_model", broken_train_model)
    tr, va = _loaders()
    with pytest.raises(jax.errors.JaxRuntimeError, match="Mosaic"):
        train_model_resilient("ResNet18", tr, va, save=True)
    assert calls["n"] == 1


def test_save_false_disables_restart(monkeypatch):
    """Without resume checkpoints there is nothing to restart from."""
    calls = {"n": 0}

    def broken_train_model(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError(TRANSIENT_MSG)

    monkeypatch.setattr(trainer, "train_model", broken_train_model)
    tr, va = _loaders()
    with pytest.raises(jax.errors.JaxRuntimeError):
        train_model_resilient("ResNet18", tr, va, save=False)
    assert calls["n"] == 1


def test_restart_budget_exhausts(monkeypatch):
    calls = {"n": 0}

    def always_flaky(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError(TRANSIENT_MSG)

    monkeypatch.setattr(trainer, "train_model", always_flaky)
    tr, va = _loaders()
    logs = []
    with pytest.raises(jax.errors.JaxRuntimeError):
        train_model_resilient("ResNet18", tr, va, save=True, max_restarts=2,
                              log=logs.append)
    assert calls["n"] == 3  # initial + 2 restarts
    assert sum("transient runtime failure" in ln for ln in logs) == 2
