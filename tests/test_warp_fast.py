"""Gather-free warp vs exact single-pass bilinear warp."""

import numpy as np
import pytest

import jax.numpy as jnp

from medseg_tpu.ops import image as I
from medseg_tpu.ops.warp_fast import warp_affine_fast


def _smooth_image(h, w, c=3):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 127 + 80 * np.sin(2 * np.pi * x / 37) * np.cos(2 * np.pi * y / 29)
    img = np.stack([base + 10 * k for k in range(c)], axis=-1)
    return np.clip(img, 0, 255).astype(np.float32)


def test_identity_is_exact(rng_np):
    img = rng_np.integers(0, 256, (2, 64, 64, 3), np.uint8)
    mats = I.identity_affine((2,))
    out = np.asarray(warp_affine_fast(jnp.asarray(img), mats))
    np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-3)


def test_flip_is_exact(rng_np):
    img = rng_np.integers(0, 256, (1, 64, 64, 3), np.uint8)
    mats = jnp.broadcast_to(I.hflip_matrix(64), (1, 2, 3))
    out = np.asarray(warp_affine_fast(jnp.asarray(img), mats))
    np.testing.assert_allclose(out, img[:, :, ::-1].astype(np.float32), atol=1e-3)


@pytest.mark.parametrize("angle,scale,dx,dy", [
    (12.0, 1.0, 0.0, 0.0),
    (-15.0, 0.95, 0.05, -0.05),
    (7.0, 1.05, -0.03, 0.02),
    (0.0, 1.04, 0.0, 0.0),
])
def test_matches_exact_warp_on_smooth_images(angle, scale, dx, dy):
    h = w = 96
    img = _smooth_image(h, w)[None]
    mats = I.shift_scale_rotate_matrix(
        jnp.asarray([angle]), jnp.asarray([scale]), jnp.asarray([dx]),
        jnp.asarray([dy]), h, w)
    exact = np.asarray(I.warp_affine(jnp.asarray(img), mats, bilinear=True))
    fast = np.asarray(warp_affine_fast(jnp.asarray(img), mats))
    diff = np.abs(exact - fast)
    # Interior: two-pass double interpolation adds sub-level smoothing only.
    inner = diff[:, 8:-8, 8:-8]
    assert np.median(inner) < 0.5, np.median(inner)
    assert np.percentile(inner, 99) < 4.0, np.percentile(inner, 99)
    # Borders (reflect handling differs slightly): still bounded.
    assert diff.mean() < 1.5, diff.mean()


def test_batch_of_mixed_transforms(rng_np):
    h = w = 64
    img = np.stack([_smooth_image(h, w) for _ in range(4)])
    angles = jnp.asarray([0.0, 10.0, -10.0, 15.0])
    scales = jnp.asarray([1.0, 0.95, 1.05, 1.0])
    mats = I.shift_scale_rotate_matrix(
        angles, scales, jnp.zeros(4), jnp.zeros(4), h, w)
    exact = np.asarray(I.warp_affine(jnp.asarray(img), mats))
    fast = np.asarray(warp_affine_fast(jnp.asarray(img), mats))
    inner = np.abs(exact - fast)[:, 8:-8, 8:-8]
    assert np.median(inner) < 0.5


def test_composed_flip_ssr(rng_np):
    h = w = 64
    img = _smooth_image(h, w)[None]
    ssr = I.shift_scale_rotate_matrix(
        jnp.asarray([9.0]), jnp.asarray([1.02]), jnp.asarray([0.02]),
        jnp.asarray([0.0]), h, w)
    flip = jnp.broadcast_to(I.hflip_matrix(w), (1, 2, 3))
    mats = I.compose_affine(ssr, flip)
    exact = np.asarray(I.warp_affine(jnp.asarray(img), mats))
    fast = np.asarray(warp_affine_fast(jnp.asarray(img), mats))
    inner = np.abs(exact - fast)[:, 8:-8, 8:-8]
    assert np.median(inner) < 0.6


def test_fast_warp_bounds_gate():
    """Widened AugmentConfig limits must disqualify the fast warp instead of
    silently clipping shifts (ADVICE r1, warp_fast bounds)."""
    from medseg_tpu.core.config import AugmentConfig
    from medseg_tpu.ops.warp_fast import (fast_warp_supports,
                                          photometric_threshold_ok)

    assert fast_warp_supports(AugmentConfig(), 256, 256)
    assert not fast_warp_supports(
        AugmentConfig(rotate_limit_deg=60.0), 256, 256)
    assert not fast_warp_supports(AugmentConfig(shift_limit=0.4), 256, 256)
    assert not fast_warp_supports(AugmentConfig(scale_limit=0.95), 256, 256)

    assert photometric_threshold_ok(AugmentConfig())
    assert not photometric_threshold_ok(
        AugmentConfig(brightness_limit=0.5, contrast_limit=0.2))


def test_augment_falls_back_for_wide_limits(rng_np):
    """augment_batch must still produce valid output when the config exceeds
    the fast-warp envelope (exact-warp fallback)."""
    import jax
    from medseg_tpu.core.config import AugmentConfig
    from medseg_tpu.ops.augment import augment_batch

    imgs = rng_np.integers(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    masks = (rng_np.random((2, 32, 32)) > 0.5).astype(np.uint8) * 255
    cfg = AugmentConfig(rotate_limit_deg=80.0, affine_p=1.0)
    x, m = augment_batch(jax.random.key(0), jnp.asarray(imgs),
                         jnp.asarray(masks), cfg=cfg)
    assert np.isfinite(np.asarray(x)).all()
    assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}
