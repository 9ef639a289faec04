"""Property sweep: the gather-free warp tracks the exact bilinear warp over
random draws from the full ShiftScaleRotate family (incl. composed flips)."""

import numpy as np
import pytest

import jax.numpy as jnp

from medseg_tpu.ops import image as I
from medseg_tpu.ops.warp_fast import warp_affine_fast


def _smooth(h, w, seed):
    rng = np.random.default_rng(seed)
    fy, fx = rng.uniform(10, 60, 2)
    py, px = rng.uniform(0, np.pi, 2)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 127 + 70 * np.sin(2 * np.pi * x / fx + px) * np.cos(2 * np.pi * y / fy + py)
    return np.clip(np.stack([img] * 3, -1), 0, 255).astype(np.float32)


def test_random_family_sweep():
    h = w = 64
    rng = np.random.default_rng(7)
    n = 12
    imgs = np.stack([_smooth(h, w, s) for s in range(n)])
    angles = rng.uniform(-15, 15, n).astype(np.float32)
    scales = (1 + rng.uniform(-0.05, 0.05, n)).astype(np.float32)
    dx = rng.uniform(-0.05, 0.05, n).astype(np.float32)
    dy = rng.uniform(-0.05, 0.05, n).astype(np.float32)
    flips = rng.random(n) < 0.5

    ssr = I.shift_scale_rotate_matrix(
        jnp.asarray(angles), jnp.asarray(scales), jnp.asarray(dx),
        jnp.asarray(dy), h, w)
    flip_m = jnp.broadcast_to(I.hflip_matrix(w), (n, 2, 3))
    ident = I.identity_affine((n,))
    flip_m = jnp.where(jnp.asarray(flips)[:, None, None], flip_m, ident)
    mats = I.compose_affine(ssr, flip_m)

    exact = np.asarray(I.warp_affine(jnp.asarray(imgs), mats, bilinear=True))
    fast = np.asarray(warp_affine_fast(jnp.asarray(imgs), mats))
    inner = np.abs(exact - fast)[:, 6:-6, 6:-6]
    med = np.median(inner, axis=(1, 2, 3))
    p99 = np.percentile(inner, 99, axis=(1, 2, 3))
    assert med.max() < 0.8, med
    assert p99.max() < 6.0, p99
