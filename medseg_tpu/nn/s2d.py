"""Space-to-depth lowerings for the full-resolution 64-channel U-Net blocks.

The r3 per-block profile (PERF.md "Segmentation backward") showed the 256px
C=64 blocks (conv1 / up2 / up_conv2 of AttentionUNet/ResNetUnet, reference
models/segmentation_models/AttentionUNet.py:56-120, ResnetUnet.py:29-83)
running at 17-44% f+b MFU: C=64 fills half of the 128 MXU lanes on both
input and output.  Space-to-depth re-lays the SAME math on a half-resolution
grid with 4x the channels, where the v5e runs near peak:

- ``UpConvS2D`` (nearest-2x upsample + conv3x3 + BN + ReLU, the U-Nets'
  ``up_conv``): the upsample makes the 2x2 output sub-positions read the
  SAME input pixels, so ``s2d(conv3x3(nearest2x(x))) == conv3x3(x, W')``
  with ``W' [3,3,C_in,4*C_out]`` built by summing the taps that alias each
  (sub-position, offset) cell — ZERO FLOP inflation, full output lanes,
  and the conv runs on the un-upsampled half-resolution grid.

- ``DoubleConvS2D`` (two conv3x3+BN+ReLU on an s2d tensor): exact, but the
  dense equivalent kernel ``[3,3,4*C_in,4*C_out]`` holds each original tap
  once per output sub-position = 4x the FLOPs.  Only worth it where the
  lane-fill gain exceeds 4x (candidate: conv1's C_in=3 -> 12, where the
  MXU contraction dim grows 27 -> 108); measured per-block on hardware
  before any adoption (same discipline as the r2/r3 stem experiments).

Both variants keep the module parameter tree BIT-IDENTICAL to the plain
blocks (conv/{kernel,bias} + bn/{scale,bias,mean,var}) so checkpoints and
the torch converters are untouched; equality is pinned by
tests/test_s2d.py.  BatchNorm statistics in the s2d domain reduce over
(batch, H, W, sub-position) per LOGICAL channel — the same element set as
the full-resolution reduction, so outputs and running stats match to
reduction-order tolerance.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.nn.blocks import _BNVars, _Conv1x1Params


def space_to_depth(x):
    """[B, 2H, 2W, C] -> [B, H, W, 4C]; channel index = (dy*2+dx)*C + c."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B,H,W,dy,dx,C]
    return x.reshape(b, h, w, 4 * c)


def depth_to_space(y):
    """Inverse of space_to_depth: [B, H, W, 4C] -> [B, 2H, 2W, C]."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # [B,H,dy,W,dx,C]
    return y.reshape(b, 2 * h, 2 * w, c)


def upconv_s2d_kernel(kernel):
    """[3,3,Ci,Co] conv kernel (applied after nearest-2x) -> the exact
    s2d-domain equivalent [3,3,Ci,4*Co].

    Output sub-position (dy,dx) at s2d pixel (i,j) of conv3x3(nearest2x(x))
    reads x[i+a, j+b] with a = floor((dy+ky-1)/2); taps aliasing the same
    (a, b) cell sum (they multiply the same input value after upsampling)."""
    co = kernel.shape[-1]
    out = jnp.zeros((3, 3, kernel.shape[2], 4 * co), kernel.dtype)
    for dy in range(2):
        for dx in range(2):
            sub = (dy * 2 + dx) * co
            for ky in range(3):
                for kx in range(3):
                    a = (dy + ky - 1) // 2 + 1
                    b = (dx + kx - 1) // 2 + 1
                    out = out.at[a, b, :, sub:sub + co].add(kernel[ky, kx])
    return out


def conv3x3_s2d_kernel(kernel):
    """[3,3,Ci,Co] stride-1 same-padding conv kernel -> the exact s2d-domain
    equivalent [3,3,4*Ci,4*Co] (dense: each tap appears once per output
    sub-position, i.e. 4x the FLOPs — see module docstring).

    Output sub-position dy at s2d pixel i reads input sub-position dy' of
    s2d pixel i+a where ky = 2a + dy' - dy + 1 (when 0 <= ky <= 2)."""
    ci, co = kernel.shape[2], kernel.shape[3]
    idx = [(d, a, dp, 2 * a + dp - d + 1)
           for d in range(2) for a in (-1, 0, 1) for dp in range(2)
           if 0 <= 2 * a + dp - d + 1 <= 2]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), kernel.dtype)
    for dy, a, dyp, ky in idx:
        for dx, b, dxp, kx in idx:
            out = out.at[
                a + 1, b + 1,
                (dyp * 2 + dxp) * ci:(dyp * 2 + dxp + 1) * ci,
                (dy * 2 + dx) * co:(dy * 2 + dx + 1) * co,
            ].set(kernel[ky, kx])
    return out


def _grouped_bn_stats(y_s2d, features: int):
    """Per-LOGICAL-channel batch mean/var of an s2d tensor [..., 4*C]:
    reduce over (batch, H, W, sub-position) in f32 — the same element set
    as full-resolution BN, flax's E[x^2]-E[x]^2 fast variance."""
    y = y_s2d.astype(jnp.float32).reshape(-1, 4, features)
    mean = y.mean(axis=(0, 1))
    var = jnp.maximum((y * y).mean(axis=(0, 1)) - mean * mean, 0.0)
    return mean, var


class _S2DConvBN(nn.Module):
    """Transformed-kernel conv + BN + ReLU on the s2d grid.

    Param tree identical to ConvBN (conv/{kernel,bias} + bn/{scale,bias} +
    batch_stats bn/{mean,var}); the kernel is declared at its ORIGINAL
    full-resolution shape and re-laid out per step by `kernel_transform`
    (a few dozen slice-updates of a small weight tensor — negligible next
    to the conv, and the backward through them is the exact transpose)."""

    features: int
    c_in: int
    kernel_transform: Callable
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x_s2d, train: bool = False):
        kernel, bias = _Conv1x1Params(self.features, self.c_in,
                                      kernel_size=3, name="conv")()
        w = self.kernel_transform(kernel)
        y = jax.lax.conv_general_dilated(
            x_s2d.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.tile(bias, 4).astype(self.dtype)
        if train:
            mean, var = _grouped_bn_stats(y, self.features)
            scale, bn_bias, _, _ = _BNVars(self.features, name="bn")(mean, var)
        else:
            scale, bn_bias, mean, var = _BNVars(self.features, name="bn")()
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        y = (y - jnp.tile(mean, 4).astype(self.dtype)) \
            * jnp.tile(inv, 4).astype(self.dtype) \
            + jnp.tile(bn_bias, 4).astype(self.dtype)
        return nn.relu(y)


class UpConvS2D(nn.Module):
    """Exact twin of UpConv (nearest-2x + conv3x3 + BN + ReLU) computed on
    the UN-upsampled grid: takes [B,H,W,Ci], returns [B,2H,2W,F] (or the
    s2d layout [B,H,W,4F] with keep_s2d=True for fusion with a consumer
    that also runs in the s2d domain).  Zero FLOP inflation; identical
    param tree (outer name "conv" mirrors UpConv's inner ConvBN)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, keep_s2d: bool = False):
        y = _S2DConvBN(self.features, x.shape[-1], upconv_s2d_kernel,
                       dtype=self.dtype, name="conv")(x, train)
        return y if keep_s2d else depth_to_space(y)


class DoubleConvS2D(nn.Module):
    """Exact twin of DoubleConv computed in the s2d domain (4x FLOPs at
    full lane occupancy — an experiment, see module docstring).  Takes the
    full-resolution [B,2H,2W,Ci]; identical param tree to DoubleConv."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, keep_s2d: bool = False):
        xs = space_to_depth(x)
        xs = _S2DConvBN(self.features, x.shape[-1], conv3x3_s2d_kernel,
                        dtype=self.dtype, name="conv1")(xs, train)
        xs = _S2DConvBN(self.features, self.features, conv3x3_s2d_kernel,
                        dtype=self.dtype, name="conv2")(xs, train)
        return xs if keep_s2d else depth_to_space(xs)
