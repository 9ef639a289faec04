"""Pallas TPU kernel: VMEM-resident gather-free affine warp.

Same math as ops/warp_fast.py (two-pass Catmull-Smith factorization, hat
matmuls + two-level masked rolls) but executed entirely in VMEM per image:
the XLA version materializes ~50 padded-canvas temporaries in HBM per batch
(memory-bound at large batch); here each grid step loads one padded image
into VMEM once, runs both passes on-chip (matmuls on the MXU, rolls on the
VPU), and writes only the cropped 256x256 result.

Layout per grid step (one image, Hp=Wp=H+2*PAD=416 at 256px):
  pass A: [Hp,Wp] @ A1^T[Wp,384] -> lanes-roll by per-row delta -> crop cols
  pass B: A2[384,Hp] @ [Hp,256]  -> sublane-roll by per-col delta -> crop rows
The 384-wide intermediates carry a 64px margin so circular-roll wrap
artifacts never reach the crop (see warp_fast.py docstring for bounds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medseg_tpu.ops.warp_fast import COARSE, MAX_SHIFT, PAD

MARGIN = 64  # roll margin inside the kernel intermediates


def _hat(src, n_in: int, nearest: bool):
    """[n_out, n_in] interpolation weights for source coords src [n_out, 1]."""
    i = jax.lax.broadcasted_iota(jnp.int32, (src.shape[0], n_in), 1).astype(jnp.float32)
    if nearest:
        return (jnp.floor(src + 0.5) == i).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - i))


def _shift_lines(x, delta, axis: int, nearest: bool):
    """Two-level masked circular roll: out[.., t, ..] = x[.., t + delta_line, ..].

    axis=1: shift lanes (last dim), delta per sublane row [N, 1].
    axis=0: shift sublanes (first dim), delta per lane column [1, N].
    """
    if nearest:
        delta = jnp.floor(delta + 0.5)
    delta = jnp.clip(delta, -(MAX_SHIFT - 1.0), MAX_SHIFT - 1.0)
    k = jnp.floor(delta)
    frac = delta - k
    k = k.astype(jnp.int32)
    q = k // COARSE
    r = k - q * COARSE

    roll_axis = 1 if axis == 1 else 0
    n = x.shape[roll_axis]
    n_coarse = MAX_SHIFT // COARSE
    t1 = jnp.zeros_like(x)
    for qq in range(-n_coarse, n_coarse + 1):
        rolled = pltpu.roll(x, (-qq * COARSE) % n, axis=roll_axis)
        t1 = t1 + jnp.where(q == qq, rolled, 0.0)
    out = jnp.zeros_like(x)
    for rr in range(COARSE + 1):
        w = (r == rr) * (1.0 - frac) + (r == rr - 1) * frac
        out = out + w * pltpu.roll(t1, (-rr) % n, axis=roll_axis)
    return out


def _warp_kernel(scal_ref, img_ref, out_ref, *, hp: int, wp: int, h: int,
                 w: int, c: int, nearest: bool, out_dtype):
    # scal_ref [1, 6] SMEM: aa, cc, bb, m11, m12p, m10 (see warp_fast.py)
    aa = scal_ref[0, 0]
    cc = scal_ref[0, 1]
    bb = scal_ref[0, 2]
    m11 = scal_ref[0, 3]
    m12p = scal_ref[0, 4]
    m10 = scal_ref[0, 5]

    wide = w + 2 * MARGIN  # 384 at 256px
    col0 = PAD - MARGIN    # padded-coord origin of the wide window (16)
    mid_row = (hp - 1) * 0.5
    mid_col = (wp - 1) * 0.5

    # Pass A (horizontal): src_x = aa*u + bb*row + cc
    u = jax.lax.broadcasted_iota(jnp.int32, (wide, 1), 0).astype(jnp.float32) + col0
    a1 = _hat(aa * u + (cc + bb * mid_row), wp, nearest)      # [wide, Wp]
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, 1), 0).astype(jnp.float32)
    delta_a = bb * (rows - mid_row) / aa                       # [Hp, 1]

    # Pass B (vertical): src_y = m11*v + m10*col + m12p
    v = jax.lax.broadcasted_iota(jnp.int32, (wide, 1), 0).astype(jnp.float32) + col0
    a2 = _hat(m11 * v + (m12p + m10 * mid_col), hp, nearest)   # [wide, Hp]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32) + PAD
    delta_b = m10 * (cols - mid_col) / m11                     # [1, w]

    for ch in range(c):
        plane = img_ref[0, :, :, ch].astype(jnp.float32)       # [Hp, Wp]
        tmp = jax.lax.dot_general(
            plane, a1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [Hp, wide]
        tmp = _shift_lines(tmp, delta_a, axis=1, nearest=nearest)
        tmp = tmp[:, MARGIN:MARGIN + w]                        # [Hp, w]
        outp = jnp.dot(a2, tmp, preferred_element_type=jnp.float32)  # [wide, w]
        outp = _shift_lines(outp, delta_b, axis=0, nearest=nearest)
        out_ref[0, :, :, ch] = outp[MARGIN:MARGIN + h].astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("nearest", "out_dtype", "interpret"))
def warp_affine_pallas(images: jax.Array, matrices: jax.Array,
                       nearest: bool = False, out_dtype=jnp.float32,
                       interpret: bool = False) -> jax.Array:
    """Drop-in for warp_affine_fast with a VMEM-resident Pallas kernel.

    images [B,H,W,C], matrices [B,2,3] dst->src (unpadded coords).
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)), mode="reflect")
    hp, wp = h + 2 * PAD, w + 2 * PAD

    m00 = matrices[:, 0, 0]
    m01 = matrices[:, 0, 1]
    m02 = matrices[:, 0, 2]
    m10 = matrices[:, 1, 0]
    m11 = matrices[:, 1, 1]
    m12 = matrices[:, 1, 2]
    m02p = m02 + PAD * (1.0 - m00 - m01)
    m12p = m12 + PAD * (1.0 - m10 - m11)
    bb = m01 / m11
    aa = m00 - bb * m10
    cc = m02p - bb * m12p
    scalars = jnp.stack([aa, cc, bb, m11, m12p, m10], axis=-1)  # [B, 6]

    kernel = functools.partial(_warp_kernel, hp=hp, wp=wp, h=h, w=w, c=c,
                               nearest=nearest, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 6), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), out_dtype),
        interpret=interpret,
    )(scalars, x)
