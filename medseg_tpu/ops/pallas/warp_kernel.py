"""Pallas TPU kernel: VMEM-resident gather-free affine warp.

Same math as ops/warp_fast.py (two-pass Catmull-Smith factorization, hat
matmuls + two-level masked rolls) but executed entirely in VMEM per image
plane: the XLA version materializes ~50 padded-canvas temporaries in HBM per
batch (memory-bound at large batch); here each grid step loads one padded
plane into VMEM once, runs both passes on-chip (matmuls on the MXU, rolls on
the VPU), and writes only the cropped HxW result.

Layout (Mosaic constraints): PLANAR [B*C, Hp, Wp] input — lanes = Wp;
channels-last 3-deep lane layouts are unsupported.  Grid step i handles
plane i with per-image scalars at row i // C of the SMEM table.

Per grid step at 256px (Hp = Wp = 416, wide = 384):
  pass A: [Hp,Wp] @ A1^T[Wp,wide] -> lane-rolls by per-row delta -> crop cols
  pass B: A2[wide,Hp] @ [Hp,w]    -> sublane-rolls by per-col delta -> crop rows
The wide intermediates carry a 64px margin so circular-roll wrap artifacts
never reach the crop (bounds in warp_fast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medseg_tpu.ops.warp_fast import MAX_SHIFT, PAD

MARGIN = 64  # roll margin inside the kernel intermediates


def _iota_f32(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _hat(src, n_in: int, nearest: bool):
    """[n_out, n_in] interpolation weights for source coords src [n_out, 1]."""
    i = _iota_f32((src.shape[0], n_in), 1)
    if nearest:
        return (jnp.floor(src + 0.5) == i).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - i))


def _shift_lines(x, delta, axis: int, nearest: bool):
    """Barrel-shifter masked roll: out[.., t, ..] = x[.., t + delta_line, ..].

    Per-line shift amounts are applied in log2(2*MAX_SHIFT) stages: offset the
    whole array by +MAX_SHIFT once, then conditionally roll by -2^j where bit
    j of (k + MAX_SHIFT) is set — 8 rolls + 7 selects instead of the naive
    2*MAX_SHIFT masked accumulation.  A final fractional blend restores
    bilinear weighting.

    axis=1: shift lanes (last dim), delta per sublane row [N, 1].
    axis=0: shift sublanes (first dim), delta per lane column [1, N].
    """
    if nearest:
        delta = jnp.floor(delta + 0.5)
    delta = jnp.clip(delta, -(MAX_SHIFT - 1.0), MAX_SHIFT - 1.0)
    k = jnp.floor(delta)
    frac = delta - k
    kk = k.astype(jnp.int32) + MAX_SHIFT  # [0, 2*MAX_SHIFT)

    roll_axis = 1 if axis == 1 else 0
    n = x.shape[roll_axis]
    out = pltpu.roll(x, MAX_SHIFT % n, axis=roll_axis)  # undo the +offset
    bits = (2 * MAX_SHIFT - 1).bit_length()
    for j in range(bits):
        bit = (kk >> j) & 1
        rolled = pltpu.roll(out, (-(1 << j)) % n, axis=roll_axis)
        out = jnp.where(bit == 1, rolled, out)
    if nearest:
        return out
    nxt = pltpu.roll(out, (-1) % n, axis=roll_axis)
    frac = frac.astype(x.dtype)
    return out * (1 - frac) + nxt * frac


def _warp_kernel(scal_ref, img_ref, out_ref, *, hp: int, wp: int, h: int,
                 w: int, c: int, nearest: bool, out_dtype,
                 mean=None, std=None):
    """One grid step = one image with its C planes stacked on sublanes
    ([C*Hp, Wp]); hat matrices are built once per image, the lane/sublane
    shift stages run on the stacked array (channel cross-talk from circular
    rolls stays inside the cropped MARGIN because |shift| < MARGIN).

    mean/std (static per-channel tuples) enable the fused photometric
    epilogue: brightness/contrast (alpha/beta scalars) + normalize applied
    in the same VMEM pass — the whole augmentation chain in one kernel.
    """
    # scal_ref [B, 6(+2)] SMEM (full): aa, cc, bb, m11, m12p, m10 [, alpha, beta]
    i = pl.program_id(0)
    aa = scal_ref[i, 0]
    cc = scal_ref[i, 1]
    bb = scal_ref[i, 2]
    m11 = scal_ref[i, 3]
    m12p = scal_ref[i, 4]
    m10 = scal_ref[i, 5]

    wide = w + 2 * MARGIN  # 384 at 256px
    col0 = PAD - MARGIN    # padded-coord origin of the wide window (16)
    mid_row = (hp - 1) * 0.5
    mid_col = (wp - 1) * 0.5

    # Pass A (horizontal): src_x = aa*u + bb*row + cc
    u = _iota_f32((wide, 1), 0) + col0
    a1 = _hat(aa * u + (cc + bb * mid_row), wp, nearest)       # [wide, Wp]
    rows = _iota_f32((hp, 1), 0)
    delta_a = bb * (rows - mid_row) / aa                       # [Hp, 1]

    # Pass B (vertical): src_y = m11*v + m10*col + m12p
    v = _iota_f32((wide, 1), 0) + col0
    a2 = _hat(m11 * v + (m12p + m10 * mid_col), hp, nearest)   # [wide, Hp]
    cols = _iota_f32((1, w), 1) + PAD
    delta_b = m10 * (cols - mid_col) / m11                     # [1, w]

    # Shift stages must run in f32: Mosaic's tpu.dynamic_rotate only
    # implements 32-bit element types on this generation (bf16 rolls would
    # halve the bandwidth-bound VMEM traffic — revisit when supported).
    # Pass A runs channel-stacked when the working set fits VMEM (C <= 3:
    # one shared matmul + one shift sequence; lane rolls can't cross rows so
    # stacking is exact); larger C falls back to per-channel to bound VMEM.
    stack_pass_a = c <= 3
    if stack_pass_a:
        stacked = img_ref[0]                                   # [C*Hp, Wp]
        tmp_all = jax.lax.dot_general(
            stacked, a1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [C*Hp, wide]
        srows = _iota_f32((c * hp, 1), 0)
        srows = srows - hp * jnp.floor(srows / hp)             # row % Hp
        delta_a_stacked = bb * (srows - mid_row) / aa
        tmp_all = _shift_lines(tmp_all, delta_a_stacked, axis=1,
                               nearest=nearest)
        tmp_all = tmp_all[:, MARGIN:MARGIN + w]                # [C*Hp, w]
    for ch in range(c):
        if stack_pass_a:
            tmp = tmp_all[ch * hp:(ch + 1) * hp]               # [Hp, w]
        else:
            plane = img_ref[0, ch * hp:(ch + 1) * hp]          # [Hp, Wp] f32
            tmp = jax.lax.dot_general(
                plane, a1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # [Hp, wide]
            tmp = _shift_lines(tmp, delta_a, axis=1, nearest=nearest)
            tmp = tmp[:, MARGIN:MARGIN + w]                    # [Hp, w]
        outp = jnp.dot(a2, tmp, preferred_element_type=jnp.float32)  # [wide, w]
        outp = _shift_lines(outp, delta_b, axis=0, nearest=nearest)
        outp = outp[MARGIN:MARGIN + h]
        if mean is not None:
            alpha = scal_ref[i, 6]
            beta = scal_ref[i, 7]
            outp = jnp.clip(outp * alpha + beta * 255.0, 0.0, 255.0)
            outp = (outp - mean[ch]) / std[ch]
        out_ref[0, ch * h:(ch + 1) * h, :] = outp.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("nearest", "out_dtype", "interpret",
                                    "mean", "std"))
def warp_affine_pallas(images: jax.Array, matrices: jax.Array,
                       nearest: bool = False, out_dtype=jnp.float32,
                       interpret: bool = False, alpha=None, beta=None,
                       mean=None, std=None) -> jax.Array:
    """Drop-in for warp_affine_fast with a VMEM-resident Pallas kernel.

    images [B,H,W,C], matrices [B,2,3] dst->src (unpadded coords).
    With alpha/beta [B] and static mean/std tuples (0..255 scale), the
    brightness/contrast + normalize epilogue fuses into the same pass and
    the output is model-ready.
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)), mode="reflect")
    hp, wp = h + 2 * PAD, w + 2 * PAD
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * hp, wp)

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
    cols = [aa, cc, bb, m11, m12p, m10]
    if mean is not None:
        assert alpha is not None and beta is not None
        cols += [alpha.astype(jnp.float32), beta.astype(jnp.float32)]
    scalars = jnp.stack(cols, axis=-1)  # [B, 6 or 8]

    kernel = functools.partial(_warp_kernel, hp=hp, wp=wp, h=h, w=w, c=c,
                               nearest=nearest, out_dtype=out_dtype,
                               mean=mean, std=std)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [B,6] scalar table
            pl.BlockSpec((1, c * hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c * h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c * h, w), out_dtype),
        interpret=interpret,
    )(scalars, planes)
    return jnp.transpose(out.reshape(b, c, h, w), (0, 2, 3, 1))
