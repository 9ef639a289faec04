"""Coverage for utility modules and trainer edge paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medseg_tpu.core.config import AugmentConfig, TrainConfig
from medseg_tpu.data import BatchLoader, synthetic_cls
from medseg_tpu.train import train_model
from medseg_tpu.utils import StepTimer, assert_finite, nan_check_mode, trace_context


def test_step_timer_statistics():
    import time

    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert len(t.times) == 3 and len(t.steady) == 2
    # loose upper bound: the 1-core CI box can stall sleeps under contention
    assert 0.005 < t.mean() < 5.0
    assert "throughput" in t.summary(items_per_step=4)


def test_trace_context_noop_without_dir():
    with trace_context(None):
        pass  # must not require jax.profiler setup


def test_assert_finite_catches_nan():
    good = {"a": jnp.ones((2,)), "b": {"c": jnp.zeros((3,))}}
    assert_finite(good, "good")
    bad = {"a": jnp.asarray([1.0, float("nan")])}
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite(bad, "bad")


def test_nan_check_mode_restores_flag():
    before = jax.config.jax_debug_nans
    with nan_check_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_early_stopping_fires(tmp_path):
    """lr=0 -> no improvement after the first epoch -> patience triggers."""
    ds = synthetic_cls(n=8, img_size=32)
    tr = BatchLoader(ds, 4, shuffle=True, indices=np.arange(6))
    va = BatchLoader(ds, 2, shuffle=False, indices=np.arange(6, 8))
    cfg = TrainConfig(epochs=12, stage1_epochs=1, lr=0.0, stage1_lr=0.0,
                      early_stop_patience=2, save_root=str(tmp_path),
                      compute_dtype="float32")
    logs = []
    res = train_model("ResNet18", tr, va, cfg,
                      AugmentConfig(affine_p=0.0, brightness_contrast_p=0.0,
                                    hflip_p=0.0),
                      save=False, log=logs.append)
    assert any("Early stopping" in l for l in logs)
    assert res.epochs_run < 12


def test_augment_params_gating_zero_probability():
    from medseg_tpu.ops.augment import sample_augment_params

    cfg = AugmentConfig(affine_p=0.0, hflip_p=0.0, brightness_contrast_p=0.0)
    p = sample_augment_params(jax.random.key(0), 64, cfg)
    assert np.all(np.asarray(p.angle_deg) == 0.0)
    assert np.all(np.asarray(p.scale) == 1.0)
    assert not np.any(np.asarray(p.flip))
    assert np.all(np.asarray(p.alpha) == 1.0)
    assert np.all(np.asarray(p.beta) == 0.0)
