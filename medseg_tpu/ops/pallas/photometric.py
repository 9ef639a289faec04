"""Pallas TPU kernel: fused flip + brightness/contrast + ImageNet normalize.

One VMEM pass per image plane fuses the photometric tail of the augmentation
chain (reference utils/trainer.py:64-66): optional horizontal flip,
RandomBrightnessContrast (alpha/beta in 0..255 space, clipped), and
A.Normalize — float32 planes in, bf16/f32 out, no HBM round-trips between
ops.

Layout notes (Mosaic constraints): channels-last [H,W,3] puts C on the lane
axis (3 of 128 lanes) and trips unsupported shape casts, so the kernel works
on PLANAR [B*C, H, W] blocks — lanes = W.  The flip is an anti-identity
contraction (Mosaic has no lax.rev); per-sample scalars live in SMEM and are
indexed by program id.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medseg_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD


def _kernel(scal_ref, img_ref, out_ref, *, channels: int, out_dtype):
    i = pl.program_id(0)
    img_idx = i // channels
    ch = i - img_idx * channels
    alpha = scal_ref[img_idx, 0]
    beta = scal_ref[img_idx, 1]
    flip = scal_ref[img_idx, 2]
    mean = scal_ref[img_idx, 3 + ch]
    std = scal_ref[img_idx, 3 + channels + ch]

    x = img_ref[0]  # [H, W] float32 plane
    n_w = x.shape[1]
    wi = jax.lax.broadcasted_iota(jnp.int32, (n_w, n_w), 0)
    wj = jax.lax.broadcasted_iota(jnp.int32, (n_w, n_w), 1)
    anti = (wi + wj == n_w - 1).astype(jnp.float32)
    flipped = jnp.dot(x, anti, preferred_element_type=jnp.float32)
    x = jnp.where(flip > 0.5, flipped, x)
    x = x * alpha + beta * 255.0
    x = jnp.clip(x, 0.0, 255.0)
    out_ref[0] = ((x - mean) / std).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_photometric(images_u8: jax.Array, alpha: jax.Array, beta: jax.Array,
                      flip: jax.Array, out_dtype=jnp.float32,
                      interpret: bool = False) -> jax.Array:
    """images_u8 [B,H,W,3]; alpha/beta [B] floats; flip [B] bool.
    Returns normalized float images with per-sample flip applied."""
    b, h, w, c = images_u8.shape
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    scalars = jnp.concatenate([
        alpha.astype(jnp.float32)[:, None],
        beta.astype(jnp.float32)[:, None],
        flip.astype(jnp.float32)[:, None],
        jnp.broadcast_to(mean, (b, c)),
        jnp.broadcast_to(std, (b, c)),
    ], axis=-1)  # [B, 3 + 2C]

    planes = jnp.transpose(images_u8.astype(jnp.float32),
                           (0, 3, 1, 2)).reshape(b * c, h, w)
    kernel = functools.partial(_kernel, channels=c, out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b * c,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [B, 3+2C] table
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * c, h, w), out_dtype),
        interpret=interpret,
    )(scalars, planes)
    return jnp.transpose(out.reshape(b, c, h, w), (0, 2, 3, 1))
