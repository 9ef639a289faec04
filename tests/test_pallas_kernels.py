"""Pallas kernel tests vs pure-jnp references (interpret mode on CPU,
SURVEY.md §4 kernel test strategy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from medseg_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD
from medseg_tpu.ops.pallas.photometric import fused_photometric


def _reference(images, alpha, beta, flip):
    x = images.astype(np.float32)
    x = np.where(flip[:, None, None, None], x[:, :, ::-1], x)
    x = x * alpha[:, None, None, None] + beta[:, None, None, None] * 255.0
    x = np.clip(x, 0, 255)
    mean = np.array(IMAGENET_MEAN, np.float32) * 255
    std = np.array(IMAGENET_STD, np.float32) * 255
    return (x - mean) / std


def test_fused_photometric_matches_reference(rng_np):
    b, h, w = 3, 16, 16
    images = rng_np.integers(0, 256, (b, h, w, 3), np.uint8)
    alpha = np.array([1.0, 0.92, 1.08], np.float32)
    beta = np.array([0.0, 0.05, -0.1], np.float32)
    flip = np.array([False, True, False])
    got = np.asarray(fused_photometric(
        jnp.asarray(images), jnp.asarray(alpha), jnp.asarray(beta),
        jnp.asarray(flip), interpret=True))
    want = _reference(images, alpha, beta, flip)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_photometric_bf16_output(rng_np):
    images = rng_np.integers(0, 256, (2, 8, 8, 3), np.uint8)
    out = fused_photometric(
        jnp.asarray(images), jnp.ones(2), jnp.zeros(2),
        jnp.zeros(2, bool), out_dtype=jnp.bfloat16, interpret=True)
    assert out.dtype == jnp.bfloat16
    want = _reference(images, np.ones(2, np.float32), np.zeros(2, np.float32),
                      np.zeros(2, bool))
    np.testing.assert_allclose(np.asarray(out, np.float32), want, atol=0.05)


def test_warp_kernel_matches_xla_warp_interpret(rng_np):
    """Pad-free Pallas warp == XLA two-pass warp (interpret mode; the TPU
    bit-exactness run lives in PERF.md's validation log)."""
    from medseg_tpu.ops import image as I
    from medseg_tpu.ops.pallas.warp_kernel import warp_affine_pallas
    from medseg_tpu.ops.warp_fast import warp_affine_fast

    n, sz = 4, 64
    imgs = jnp.asarray(rng_np.integers(0, 256, (n, sz, sz, 3)).astype(np.uint8))
    mats = I.shift_scale_rotate_matrix(
        jnp.asarray(rng_np.uniform(-15, 15, n).astype(np.float32)),
        jnp.asarray(rng_np.uniform(0.95, 1.05, n).astype(np.float32)),
        jnp.asarray(rng_np.uniform(-0.05, 0.05, n).astype(np.float32)),
        jnp.asarray(rng_np.uniform(-0.05, 0.05, n).astype(np.float32)),
        sz, sz)
    ref = warp_affine_fast(imgs, mats)
    got = warp_affine_pallas(imgs, mats, interpret=True)
    # atol: CPU-only FMA rounding between XLA's fused contractions and
    # interpret-mode dots (~0.005 gray; the r1 padded kernel showed the
    # identical interpret-mode delta).  On TPU the kernel is bit-exact vs
    # warp_affine_fast (probe logged in PERF.md).
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=0.01)
    refn = warp_affine_fast(imgs[..., :1], mats, nearest=True)
    gotn = warp_affine_pallas(imgs[..., :1], mats, nearest=True,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(gotn), np.asarray(refn))
