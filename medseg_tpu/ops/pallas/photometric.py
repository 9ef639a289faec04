"""Pallas TPU kernel: fused flip + brightness/contrast + ImageNet normalize.

One VMEM pass over each image fuses the photometric tail of the augmentation
chain (reference utils/trainer.py:64-66): optional horizontal flip (lane
reversal), RandomBrightnessContrast (alpha/beta in 0..255 space, clipped),
and A.Normalize — uint8 in, bf16/f32 out, no HBM round-trips between ops.

Layout: images are processed as [H, W*C] blocks (W*C = 768 lanes for
256x256x3 = 6 native lanes tiles); the flip reverses whole pixels (groups of
C lanes), implemented as a W-reversal on a [H*C?]-free reshape inside the
kernel.  Per-sample scalars (alpha, beta, flip) ride in SMEM.

Grid: one program per image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medseg_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD


def _kernel(scal_ref, img_ref, out_ref, *, mean, std, out_dtype):
    # img_ref: [1, H, W, C] uint8 block; scal_ref: [1, 3] SMEM f32
    alpha = scal_ref[0, 0]
    beta = scal_ref[0, 1]
    flip = scal_ref[0, 2]

    x = img_ref[0].astype(jnp.float32)  # [H, W, C]
    flipped = jax.lax.rev(x, dimensions=(1,))
    x = jnp.where(flip > 0.5, flipped, x)
    x = x * alpha + beta * 255.0
    x = jnp.clip(x, 0.0, 255.0)
    # Per-channel normalize with scalar constants (Pallas forbids captured
    # array constants; scalars are fine).
    chans = [(x[:, :, c] - mean[c]) / std[c] for c in range(len(mean))]
    x = jnp.stack(chans, axis=-1)
    out_ref[0] = x.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_photometric(images_u8: jax.Array, alpha: jax.Array, beta: jax.Array,
                      flip: jax.Array, out_dtype=jnp.float32,
                      interpret: bool = False) -> jax.Array:
    """images_u8 [B,H,W,3]; alpha/beta [B] floats; flip [B] bool.
    Returns normalized float images with per-sample flip applied."""
    b, h, w, c = images_u8.shape
    scalars = jnp.stack([alpha.astype(jnp.float32),
                         beta.astype(jnp.float32),
                         flip.astype(jnp.float32)], axis=-1)  # [B, 3]
    mean = tuple(m * 255.0 for m in IMAGENET_MEAN)
    std = tuple(s * 255.0 for s in IMAGENET_STD)

    kernel = functools.partial(_kernel, mean=mean, std=std, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), out_dtype),
        interpret=interpret,
    )(scalars, images_u8)
