"""Image-op parity tests vs cv2 (the library underneath Albumentations)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp  # noqa: E402

from medseg_tpu.ops import image as I  # noqa: E402


def test_resize_bilinear_matches_cv2(rng_np):
    img = rng_np.integers(0, 256, size=(1, 299, 299, 3), dtype=np.uint8)
    got = np.asarray(I.resize_bilinear(jnp.asarray(img), 256, 256))[0]
    # cv2's uint8 path uses 11-bit fixed point; its float path is exact math.
    want = cv2.resize(
        img[0].astype(np.float32), (256, 256), interpolation=cv2.INTER_LINEAR
    )
    assert np.abs(got - want).max() <= 1e-2
    want_u8 = cv2.resize(img[0], (256, 256), interpolation=cv2.INTER_LINEAR)
    assert np.abs(got - want_u8.astype(np.float32)).max() <= 3.0


def test_resize_bilinear_identity(rng_np):
    img = rng_np.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    got = np.asarray(I.resize_bilinear(jnp.asarray(img), 16, 16))
    np.testing.assert_allclose(got, img.astype(np.float32))


def test_resize_nearest_matches_cv2(rng_np):
    img = rng_np.integers(0, 256, size=(1, 299, 299), dtype=np.uint8)
    got = np.asarray(I.resize_nearest(jnp.asarray(img), 256, 256))[0]
    want = cv2.resize(img[0], (256, 256), interpolation=cv2.INTER_NEAREST)
    assert (got != want).mean() < 0.02  # rounding-tie differences only


def test_letterbox_square_is_plain_resize(rng_np):
    img = rng_np.integers(0, 256, size=(1, 299, 299, 3), dtype=np.uint8)
    lb = np.asarray(I.letterbox_resize(jnp.asarray(img), 256))
    rs = np.asarray(I.resize_bilinear(jnp.asarray(img), 256, 256))
    np.testing.assert_allclose(lb, rs)


def test_letterbox_rectangular_pads_centered():
    img = np.full((1, 100, 200, 3), 255, dtype=np.uint8)
    out = np.asarray(I.letterbox_resize(jnp.asarray(img), 64))
    assert out.shape == (1, 64, 64, 3)
    new_h, new_w, pad_top, pad_left = I.letterbox_params(100, 200, 64)
    assert (new_h, new_w) == (32, 64)
    assert pad_top == 16 and pad_left == 0
    assert out[0, :16].max() == 0 and out[0, -16:].max() == 0
    assert out[0, 20:40].min() == 255


def test_warp_affine_matches_cv2(rng_np):
    h = w = 64
    img = rng_np.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    angle, scale, dx, dy = 12.0, 1.04, 0.03, -0.02

    # cv2 forward matrix: rotate+scale about center, then translate.
    m = cv2.getRotationMatrix2D(((w - 1) / 2, (h - 1) / 2), -angle, scale)
    m[0, 2] += dx * w
    m[1, 2] += dy * h
    want = cv2.warpAffine(
        img, m, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101
    ).astype(np.float32)

    mat = I.shift_scale_rotate_matrix(
        jnp.asarray([angle]), jnp.asarray([scale]), jnp.asarray([dx]), jnp.asarray([dy]), h, w
    )
    got = np.asarray(I.warp_affine(jnp.asarray(img)[None], mat, bilinear=True))[0]
    # Interior agreement; borders differ slightly due to reflect-fold of
    # float coords vs cv2's integer-pixel reflection.
    diff = np.abs(got - want)[4:-4, 4:-4]
    assert np.median(diff) <= 1.0
    assert (diff > 8).mean() < 0.01


def test_warp_identity_and_flip(rng_np):
    img = rng_np.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    ident = I.identity_affine((2,))
    out = np.asarray(I.warp_affine(jnp.asarray(img), ident, bilinear=True))
    np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-4)

    flip = jnp.broadcast_to(I.hflip_matrix(32), (2, 2, 3))
    out = np.asarray(I.warp_affine(jnp.asarray(img), flip, bilinear=True))
    np.testing.assert_allclose(out, img[:, :, ::-1].astype(np.float32), atol=1e-4)


def test_compose_affine_equals_sequential(rng_np):
    img = rng_np.integers(0, 256, size=(1, 32, 32, 1), dtype=np.uint8)
    a = I.shift_scale_rotate_matrix(
        jnp.asarray([10.0]), jnp.asarray([1.0]), jnp.asarray([0.0]), jnp.asarray([0.0]), 32, 32)
    flip = jnp.broadcast_to(I.hflip_matrix(32), (1, 2, 3))
    combined = I.compose_affine(a, flip)
    # sequential: warp by a first (SSR), then flip output
    seq = np.asarray(I.warp_affine(jnp.asarray(img), a))[:, :, ::-1]
    got = np.asarray(I.warp_affine(jnp.asarray(img), combined))
    diff = np.abs(seq - got)[:, 2:-2, 2:-2]
    assert np.median(diff) < 1.0


def test_normalize_imagenet():
    img = np.zeros((1, 2, 2, 3), np.uint8)
    img[..., :] = 255
    out = np.asarray(I.normalize_imagenet(jnp.asarray(img), (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)))
    want = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_reflect101_fold():
    c = jnp.asarray([-2.0, -1.0, -0.5, 0.0, 3.0, 3.5, 4.0, 5.0])
    got = np.asarray(I._reflect101(c, 4))
    want = np.array([2.0, 1.0, 0.5, 0.0, 3.0, 2.5, 2.0, 1.0])
    np.testing.assert_allclose(got, want)
