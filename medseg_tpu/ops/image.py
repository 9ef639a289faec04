"""Device-side image ops: MXU-friendly resize, affine warp, normalization.

These replace the Albumentations/cv2 CPU chain (reference utils/trainer.py:52-115)
with compiled TPU code.  Design notes:

- `resize_bilinear` is expressed as two dense matmuls with precomputed
  (static-shape) interpolation matrices, so XLA schedules it on the MXU
  instead of emitting gathers.  It uses cv2/albumentations' half-pixel-center
  convention (src = (dst + 0.5) * scale - 0.5, edges clamped), which is what
  `A.Resize` / `A.LongestMaxSize` do.
- `warp_affine` implements the ShiftScaleRotate geometry with reflect-101
  borders (Albumentations' default border mode for affine transforms) via a
  flat gather; bilinear for images, nearest for masks.
- All ops are batched over the leading dim and layout is NHWC (TPU-native),
  unlike the reference's NCHW tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Resize as matmul
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _linear_resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix, half-pixel convention."""
    scale = n_in / n_out
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(src).astype(np.int64)
    w1 = src - x0
    x1 = np.clip(x0 + 1, 0, n_in - 1)
    x0 = np.clip(x0, 0, n_in - 1)
    mat = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    np.add.at(mat, (rows, x0), (1.0 - w1).astype(np.float32))
    np.add.at(mat, (rows, x1), w1.astype(np.float32))
    return mat


@functools.lru_cache(maxsize=64)
def _nearest_resize_index(n_out: int, n_in: int) -> np.ndarray:
    """Source index per output position, cv2 INTER_NEAREST convention."""
    scale = n_in / n_out
    src = np.floor(np.arange(n_out, dtype=np.float64) * scale).astype(np.int64)
    return np.clip(src, 0, n_in - 1)


def resize_bilinear(images: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Batched bilinear resize, NHWC (or NHW); compute in float32 via matmuls."""
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    _, h, w, _ = images.shape
    if (h, w) == (out_h, out_w):
        out = images.astype(jnp.float32)
        return out[..., 0] if squeeze else out
    a_h = jnp.asarray(_linear_resize_matrix(out_h, h))
    a_w = jnp.asarray(_linear_resize_matrix(out_w, w))
    x = images.astype(jnp.float32)
    x = jnp.einsum("oh,bhwc->bowc", a_h, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("pw,bowc->bopc", a_w, x, preferred_element_type=jnp.float32)
    if squeeze:
        x = x[..., 0]
    return x


def resize_nearest(images: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Batched nearest resize (cv2 INTER_NEAREST indexing), any dtype."""
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    _, h, w, _ = images.shape
    if (h, w) != (out_h, out_w):
        iy = jnp.asarray(_nearest_resize_index(out_h, h))
        ix = jnp.asarray(_nearest_resize_index(out_w, w))
        images = images[:, iy][:, :, ix]
    return images[..., 0] if squeeze else images


def letterbox_params(in_h: int, in_w: int, size: int):
    """(new_h, new_w, pad_top, pad_left) for LongestMaxSize + centered PadIfNeeded.

    Mirrors A.LongestMaxSize(size) + A.PadIfNeeded(size, size, BORDER_CONSTANT)
    (reference utils/trainer.py:52-60): scale so the longest side equals
    `size`, then center-pad with zeros.
    """
    scale = size / max(in_h, in_w)
    new_h = max(1, int(round(in_h * scale)))
    new_w = max(1, int(round(in_w * scale)))
    pad_top = (size - new_h) // 2
    pad_left = (size - new_w) // 2
    return new_h, new_w, pad_top, pad_left


def letterbox_resize(images: jax.Array, size: int) -> jax.Array:
    """Batched letterbox to (size, size): aspect-preserving resize + zero pad."""
    _, h, w = images.shape[:3]
    new_h, new_w, pad_top, pad_left = letterbox_params(h, w, size)
    x = resize_bilinear(images, new_h, new_w)
    pad = [(0, 0), (pad_top, size - new_h - pad_top), (pad_left, size - new_w - pad_left)]
    if x.ndim == 4:
        pad.append((0, 0))
    return jnp.pad(x, pad)


# --------------------------------------------------------------------------
# Affine warp with reflect-101 borders
# --------------------------------------------------------------------------

def _reflect101(coord: jax.Array, n: int) -> jax.Array:
    """Fold float coordinates into [0, n-1] with reflect-101 (no edge repeat)."""
    if n == 1:
        return jnp.zeros_like(coord)
    period = 2.0 * (n - 1)
    c = jnp.abs(coord)
    c = jnp.mod(c, period)
    return jnp.where(c > n - 1, period - c, c)


def _gather_hw(img: jax.Array, yi: jax.Array, xi: jax.Array) -> jax.Array:
    """img [H,W,C], integer index maps yi/xi [h,w] -> [h,w,C]."""
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    idx = yi * w + xi
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*yi.shape, c)


def _warp_one(img: jax.Array, matrix: jax.Array, bilinear: bool) -> jax.Array:
    """Warp one HWC image by the inverse (dst->src) 2x3 affine `matrix`."""
    h, w, _ = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    src_x = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    src_y = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    src_x = _reflect101(src_x, w)
    src_y = _reflect101(src_y, h)
    if bilinear:
        x0 = jnp.floor(src_x)
        y0 = jnp.floor(src_y)
        wx = src_x - x0
        wy = src_y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        f = img.astype(jnp.float32)
        v00 = _gather_hw(f, y0i, x0i)
        v01 = _gather_hw(f, y0i, x1i)
        v10 = _gather_hw(f, y1i, x0i)
        v11 = _gather_hw(f, y1i, x1i)
        wx = wx[..., None]
        wy = wy[..., None]
        return (
            v00 * (1 - wx) * (1 - wy)
            + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy
            + v11 * wx * wy
        )
    yi = jnp.clip(jnp.round(src_y).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(src_x).astype(jnp.int32), 0, w - 1)
    return _gather_hw(img, yi, xi).astype(img.dtype)


def warp_affine(images: jax.Array, matrices: jax.Array, *, bilinear: bool = True) -> jax.Array:
    """Batched affine warp: images [B,H,W,C], matrices [B,2,3] (dst->src)."""
    return jax.vmap(lambda im, m: _warp_one(im, m, bilinear))(images, matrices)


def shift_scale_rotate_matrix(angle_deg, scale, dx, dy, h: int, w: int) -> jax.Array:
    """Inverse (dst->src) matrix for ShiftScaleRotate about the image center.

    Forward transform (what Albumentations composes, utils/trainer.py:61-63):
    rotate by `angle_deg` and scale about the center, then translate by
    (dx*w, dy*h).  Batched over leading dims of the scalar inputs.
    """
    angle = jnp.deg2rad(angle_deg)
    cos = jnp.cos(angle) * scale
    sin = jnp.sin(angle) * scale
    cx = (w - 1) * 0.5
    cy = (h - 1) * 0.5
    tx = dx * w
    ty = dy * h
    # Forward: dst = R @ (src - c) + c + t  =>  src = R^-1 @ (dst - c - t) + c
    det = cos * cos + sin * sin
    inv00 = cos / det
    inv01 = sin / det
    inv10 = -sin / det
    inv11 = cos / det
    ox = cx - inv00 * (cx + tx) - inv01 * (cy + ty)
    oy = cy - inv10 * (cx + tx) - inv11 * (cy + ty)
    row0 = jnp.stack([inv00, inv01, ox], axis=-1)
    row1 = jnp.stack([inv10, inv11, oy], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def hflip_matrix(w: int) -> jnp.ndarray:
    """dst->src matrix for a horizontal flip."""
    return jnp.asarray([[-1.0, 0.0, w - 1.0], [0.0, 1.0, 0.0]], dtype=jnp.float32)


def compose_affine(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose two dst->src 2x3 affines: result maps through `a` then `b`.

    If pass 1 warps with matrix `a` (src = a @ dst) and pass 2 with `b`,
    the single-pass equivalent is src = a @ (b @ dst), i.e. `a ∘ b`.
    Batched over leading dims.
    """
    a2 = a[..., :, :2]
    lin = jnp.matmul(a2, b[..., :, :2])
    off = jnp.matmul(a2, b[..., :, 2:]) + a[..., :, 2:]
    return jnp.concatenate([lin, off], axis=-1)


def identity_affine(batch_shape=()) -> jnp.ndarray:
    eye = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=jnp.float32)
    return jnp.broadcast_to(eye, (*batch_shape, 2, 3))


# --------------------------------------------------------------------------
# Normalization
# --------------------------------------------------------------------------

def normalize_imagenet(images: jax.Array, mean, std) -> jax.Array:
    """uint8/float [B,H,W,3] in [0,255] -> float32 normalized (A.Normalize)."""
    mean = jnp.asarray(mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(std, dtype=jnp.float32) * 255.0
    return (images.astype(jnp.float32) - mean) / std


def space_to_depth(x: jax.Array) -> jax.Array:
    """NHWC [B,H,W,C] -> [B,H/2,W/2,4C], channel order c*4 + dy*2 + dx.

    The layout consumed by models.resnet.FoldedStem: 3-channel inputs
    underutilize the MXU, so the stem runs on 12-channel s2d input with
    refolded weights (PERF.md stem lever)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // 2, w // 2, c * 4)
