"""Pallas TPU kernel: VMEM-resident gather-free affine warp.

Same math as ops/warp_fast.py (two-pass Catmull-Smith factorization, hat
matmuls + two-level masked rolls) but executed entirely in VMEM per image
plane: matmuls on the MXU, rolls on the VPU, and only the cropped HxW result
written back.

Round-2 redesign — PAD-FREE INPUT: the r1 kernel consumed a reflect-101
padded f32 canvas materialized by XLA in HBM ([B, C, 416, 416] at 256px —
2.6x the pixel data, written once and read once per step).  Reflection is a
static index map, so it folds into the kernel instead:

- pass A's hat taps are reflected into the UNPADDED lane range and scattered
  via iota comparisons (`_hat` with reflect=True, pure VPU) — the horizontal
  pass reads raw [H, W] rows directly;
- the vertical pass still needs the pad-band ROWS (a rotated sample can land
  up to ~73 rows outside the image, and each padded row carries its own
  per-row lane shift, so reflection does NOT commute with pass A there);
  they are reconstructed IN VMEM by a static 0/1 row-duplication matmul
  (`R[j, r] = reflect101(j-PAD) == r`, MXU) applied to pass A's unshifted
  output, after which the per-padded-row shifts and pass B run as before.

Numerics are bit-identical to the padded formulation: every value in the
virtual canvas is reproduced exactly (single-source copies), and each hat
row holds the same <=2 products.  The kernel reads [B, C*H, W] f32 — no
padded canvas ever exists in HBM.

Layout (Mosaic constraints): PLANAR [B*C, H, W] input — lanes = W;
channels-last 3-deep lane layouts are unsupported.  Grid step i handles
image i with per-image scalars at row i of the SMEM table.  uint8-resident
input remains blocked: Mosaic has no u8<->f32 casts in-kernel, and
int32-packed lanes would need an in-kernel lane reshape ([.., W/4] ->
[.., W]) that layout inference rejects on this generation — retest on newer
toolchains (PERF.md).

Per grid step at 256px (wide = 384, Hp = 416):
  pass A: [C*H,W] @ A1^T[wide,W] -> R-dup rows -> lane-rolls per padded row
          -> crop cols
  pass B: A2[wide,Hp] @ [Hp,w]   -> sublane-rolls by per-col delta -> crop rows
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


def _reflect101_int(j, n: int):
    """Fold integer coords into [0, n-1] with reflect-101 (no edge repeat)."""
    period = 2 * (n - 1)
    r = jnp.abs(j) % period
    return jnp.minimum(r, period - r)


def _hat(src, n_in: int, nearest: bool, reflect: bool = False):
    """[n_out, n_in] interpolation weights for source coords src [n_out, 1].

    reflect=True treats src as PADDED coords sampling an UNPADDED array:
    each bilinear tap is shifted by -PAD, reflect-101-folded into [0, n_in),
    and scattered onto the row via an iota comparison — the reflect-padded
    canvas without ever building it."""
    i = jax.lax.broadcasted_iota(jnp.int32, (src.shape[0], n_in), 1)
    if not reflect:
        if nearest:
            return (jnp.floor(src + 0.5) == i.astype(jnp.float32)
                    ).astype(jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(src - i.astype(jnp.float32)))
    if nearest:
        j = jnp.floor(src + 0.5).astype(jnp.int32) - PAD
        return (_reflect101_int(j, n_in) == i).astype(jnp.float32)
    j0f = jnp.floor(src)
    # tap weights written EXACTLY as the tent form 1 - |src - j| evaluates
    # them (bitwise match with the padded/XLA formulation)
    w0 = (1.0 - (src - j0f)).astype(jnp.float32)
    w1 = (1.0 - ((j0f + 1.0) - src)).astype(jnp.float32)
    j0 = j0f.astype(jnp.int32) - PAD
    r0 = _reflect101_int(j0, n_in)
    r1 = _reflect101_int(j0 + 1, n_in)
    return ((r0 == i).astype(jnp.float32) * w0
            + (r1 == i).astype(jnp.float32) * w1)


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


def _warp_kernel(scal_ref, img_ref, out_ref, *, h: int, w: int, c: int,
                 nearest: bool, out_dtype, mean=None, std=None):
    """One grid step = one image with its C planes stacked on sublanes
    ([C*H, W]); hat and row-duplication matrices are built once per image,
    roll wrap cross-talk stays inside the cropped MARGIN (|shift| < MARGIN).

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

    hp, wp = h + 2 * PAD, w + 2 * PAD  # padded COORDINATE system only
    wide = w + 2 * MARGIN              # 384 at 256px
    col0 = PAD - MARGIN                # padded-coord origin of the wide window
    mid_row = (hp - 1) * 0.5
    mid_col = (wp - 1) * 0.5

    # Pass A (horizontal): src_x = aa*u + bb*row + cc, reflected lane taps.
    u = _iota_f32((wide, 1), 0) + col0
    a1 = _hat(aa * u + (cc + bb * mid_row), w, nearest, reflect=True)  # [wide,W]

    # Static row-duplication: virtual padded row j = real row reflect(j-PAD).
    jj = jax.lax.broadcasted_iota(jnp.int32, (hp, h), 0) - PAD
    rr = jax.lax.broadcasted_iota(jnp.int32, (hp, h), 1)
    rdup = (_reflect101_int(jj, h) == rr).astype(jnp.float32)          # [Hp,H]

    prow = _iota_f32((hp, 1), 0)
    delta_a = bb * (prow - mid_row) / aa                               # [Hp,1]

    # Pass B (vertical): src_y = m11*v + m10*col + m12p over padded rows.
    v = _iota_f32((wide, 1), 0) + col0
    a2 = _hat(m11 * v + (m12p + m10 * mid_col), hp, nearest)           # [wide,Hp]
    cols = _iota_f32((1, w), 1) + PAD
    delta_b = m10 * (cols - mid_col) / m11                             # [1, w]

    # Shift stages must run in f32: Mosaic's tpu.dynamic_rotate only
    # implements 32-bit element types on this generation (bf16 rolls would
    # halve the bandwidth-bound VMEM traffic — revisit when supported).
    # The horizontal matmul runs channel-stacked (one MXU call); the
    # padded-row duplication + shifts + vertical pass run per channel to
    # bound VMEM (each [Hp, wide] f32 intermediate is 0.64MB at 256px).
    stacked = img_ref[0]                                               # [C*H,W]
    tmp0_all = jax.lax.dot_general(
        stacked, a1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                            # [C*H,wide]
    for ch in range(c):
        tmp0 = tmp0_all[ch * h:(ch + 1) * h]                           # [H,wide]
        # HIGHEST precision: the MXU's default bf16 pass would truncate the
        # f32 pass-A values (~0.4% rel error); with the f32-split passes a
        # permutation matmul copies rows EXACTLY, keeping the kernel
        # bit-identical to the padded formulation.
        dup = jnp.dot(rdup, tmp0, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)             # [Hp,wide]
        dup = _shift_lines(dup, delta_a, axis=1, nearest=nearest)
        dup = dup[:, MARGIN:MARGIN + w]                                # [Hp,w]
        outp = jnp.dot(a2, dup, preferred_element_type=jnp.float32)    # [wide,w]
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
                                    "mean", "std", "planar"))
def warp_affine_pallas(images: jax.Array, matrices: jax.Array,
                       nearest: bool = False, out_dtype=jnp.float32,
                       interpret: bool = False, alpha=None, beta=None,
                       mean=None, std=None, planar: bool = False) -> jax.Array:
    """Drop-in for warp_affine_fast with a VMEM-resident Pallas kernel.

    images [B,H,W,C], matrices [B,2,3] dst->src (unpadded coords).
    With alpha/beta [B] and static mean/std tuples (0..255 scale), the
    brightness/contrast + normalize epilogue fuses into the same pass and
    the output is model-ready.
    planar=True returns the kernel's native [B, C*H, W] layout without the
    NHWC transpose — callers that want another layout (e.g. space-to-depth
    for the folded stem) fold their shuffle into ONE transpose of their own.
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * h, w)

    m00 = matrices[:, 0, 0]
    m01 = matrices[:, 0, 1]
    m02 = matrices[:, 0, 2]
    m10 = matrices[:, 1, 0]
    m11 = matrices[:, 1, 1]
    m12 = matrices[:, 1, 2]
    # Offsets in the PADDED coordinate system (the kernel folds the pad back
    # out via reflected taps): src' = M2 @ dst' + (m_off + P*(1 - rowsum)).
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

    kernel = functools.partial(_warp_kernel, h=h, w=w, c=c,
                               nearest=nearest, out_dtype=out_dtype,
                               mean=mean, std=std)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [B,6] scalar table
            pl.BlockSpec((1, c * h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c * h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c * h, w), out_dtype),
        interpret=interpret,
    )(scalars, planes)
    if planar:
        return out
    return jnp.transpose(out.reshape(b, c, h, w), (0, 2, 3, 1))
