"""CLIP-family preprocessing on device.

The reference round-trips eval tensors through PIL and the HF processor per
sample (utils/tester.py:341-371,430-487): denormalize -> uint8 PIL -> bicubic
resize (224 for CLIP, 352 for CLIPSeg) -> rescale -> CLIP-normalize.  Our
packed pipeline already holds the uint8 images, so the equivalent batched
device op is: bicubic resize + CLIP normalization — one fused XLA program
instead of an O(N) Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from medseg_tpu.core.config import CLIP_MEAN, CLIP_STD


def clip_preprocess(images_u8: jax.Array, size: int, out_dtype=jnp.float32) -> jax.Array:
    """uint8 NHWC -> CLIP-normalized float NHWC at (size, size).

    Bicubic resize matches PIL/HF's default resample for CLIP processors
    (half-pixel convention via jax.image.resize 'bicubic').
    """
    x = images_u8.astype(jnp.float32)
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bicubic")
        x = jnp.clip(x, 0.0, 255.0)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(CLIP_STD, jnp.float32) * 255.0
    return ((x - mean) / std).astype(out_dtype)
