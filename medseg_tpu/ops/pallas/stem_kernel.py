"""Pallas TPU kernel: fused ResNet stem (conv7x7/s2 + BN + ReLU + maxpool3/s2).

STATUS (r3, measured on v5e): numerically correct but NOT enabled anywhere
by default — 4.7x slower than the in-model XLA stem on this toolchain
because Mosaic lowers the kernel's dense 3D contraction at ~3% MFU and its
small-slab patch copies at ~77 GB/s (full post-mortem + component table in
PERF.md).  Kept in-tree, parity-tested, as the ready-made formulation to
re-measure when Mosaic's 3D-contraction codegen improves.

Why it was built: XLA executes the 3-input-channel 7x7 stem conv at ~11% MFU (the MXU's
contraction lanes are zero-padded from C_in=3), leaving the stem region at
2.91 ms of an 11.61 ms ResNet18 forward @B=256 — the last identified lever
on the flagship e2e number (PERF.md r2 stage profile; reference hot path
utils/helpers.py:317-337).  This kernel reformulates the stem as an
explicit in-VMEM im2col + dense MXU contractions and fuses the whole stem
region (conv + folded BN + ReLU + 3x3/s2 maxpool), so the only HBM traffic
is phase planes in, pooled [H/4, W/4, 64] maps out.

Formulation (shaped by this toolchain's Mosaic constraints — strided
slices/stores are rejected outright, so every tap must be a CONTIGUOUS
slice; see PERF.md r3 probe table):

- The input arrives as zero-padded SPACE-TO-4-DEPTH phase planes
  prepared by XLA outside the kernel (`s4d_planes`):
  plane[(c, ry, rx4)][rho, kappa] = img[c, 2*rho + ry, 4*kappa + rx4],
  i.e. row parity ry in {0,1} and column residue rx4 in {0..3}.  In phase
  space the stride-2/stride-4 tap patterns of the paired-output im2col
  become PURE SHIFTS: tap (c, dy, u) reads phase plane (c, (dy-3) mod 2,
  (u-3) mod 4) at row offset floor((dy-3)/2) and column offset
  floor((u-3)/4) — contiguous slices only.
- Output x positions are packed in PAIRS (xp = x//2, parity p = x%2), and
  each grid step processes TWO images, so the patch tensor's lane dim
  (i*64 + xp) and the contraction's N dim (p*64 + o) are both a dense 128.
  K = 3*7*9 = 189 taps (the 9-col-tap union of both parities' 7-tap
  windows), zero-padded to 192 — non-tile-aligned contraction dims send
  this generation's Mosaic compiler into a multi-minute hang.
- The contraction runs per y-quarter ([192, 32, 128] x [192, 128],
  contract dim 0), and the maxpool is FUSED into the same quarter loop:
  each 32-row conv chunk is pooled immediately (16 output rows), carrying
  one conv row and one x-maxed row across the quarter boundary — so no
  full-height conv buffer ever exists and peak VMEM stays ~9 MB (a whole-
  image f32 conv scratch measured 17.9 MB > the 16 MB budget).  Pool
  arithmetic runs in f32 because its shifts use tpu.dynamic_rotate, which
  this generation only implements for 32-bit element types (same
  constraint as the warp kernel's roll stages).
- BN folds into weights/bias (inference semantics: running stats); ReLU
  and the 3x3/s2 maxpool run on the [y, (i,xp), (p,o)] conv output with
  parity algebra only (shifts/maxes on non-lane dims) — the pool never
  needs a strided lane compaction.  Zero padding is exact for both conv
  (zero pad) and pool (post-ReLU values >= 0, so 0-pad == -inf-pad).

Inference-only (BN running stats); training keeps the XLA stem.
models/resnet.py's `apply_with_pallas_stem` wires it under the classifier
without touching the param tree, checkpoints, or converters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K2 = 3 * 7 * 9   # (c, dy, u) taps of the paired formulation
KPAD = 192       # contraction dim padded to a lane multiple (see module doc)


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BN(running stats) as y = x*g + b: g = scale/sqrt(var+eps)."""
    g = scale / jnp.sqrt(var + eps)
    return g, bias - mean * g


@functools.lru_cache(maxsize=1)
def _pack_selector() -> np.ndarray:
    """Static 0/1 tensor S[k, dy, dx, c, p]: tap k feeds parity p's dx."""
    s = np.zeros((KPAD, 7, 7, 3, 2), np.float32)
    for c in range(3):
        for dy in range(7):
            for u in range(9):
                k = (c * 7 + dy) * 9 + u
                for p in (0, 1):
                    dx = u - 2 * p
                    if 0 <= dx < 7:
                        s[k, dy, dx, c, p] = 1.0
    return s


def pack_weights_paired(kernel, g, b):
    """(7,7,3,64) HWIO conv kernel + folded BN (g, b [64]) ->
    W2 [KPAD, 128] (rows k=(c,dy,u), zero-padded; columns p*64+o) and
    bias2 [128].

    Column p*64+o holds kernel[dy, u-2p, c, o]*g[o]: output x = 2xp+p reads
    input col 2x+dx-3 = 4xp + (dx+2p) - 3 = 4xp + u - 3.
    """
    kg = kernel.astype(jnp.float32) * g[None, None, None, :]
    sel = jnp.asarray(_pack_selector())
    w2 = jnp.einsum("kyxcp,yxco->kpo", sel, kg).reshape(KPAD, 128)
    bias2 = jnp.concatenate([b, b])
    return w2, bias2


def s4d_planes(x_nchw: jax.Array) -> jax.Array:
    """[B, 3, H, W] -> zero-padded phase planes [B, 24, H/2 + 3, W/4 + 2].

    Plane index (c*2 + ry)*4 + rx4; rows padded (2, 1) and cols (1, 1) so
    in-kernel tap slices at offsets dy2 in {-2..1} / dx4 in {-1..1} are
    contiguous and the borders read conv-consistent zeros.  Pure XLA
    reshape/transpose/pad — runs at HBM bandwidth outside the kernel.
    """
    b, c, h, w = x_nchw.shape
    x = x_nchw.reshape(b, c, h // 2, 2, w // 4, 4)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, 24, h // 2, w // 4)
    return jnp.pad(x, ((0, 0), (0, 0), (2, 1), (1, 1)))


def _stem_kernel(ph_ref, w_ref, b_ref, out_ref, patch_ref,
                 *, h: int, w: int, dtype):
    """One grid step = TWO images ([2, 24, h/2+3, w/4+2] phase planes).

    Scratch: patch [KPAD, h/8, w/2] — one y-quarter of taps; conv output is
    pooled quarter-by-quarter in registers (see module doc)."""
    hh, qw = h // 2, w // 4          # 128, 64 at 256px
    yh = hh // 4                     # y-quarter rows (32)

    # K2..KPAD-1 are weight-zero padding rows, but scratch is uninitialized
    # (NaN * 0 = NaN) — zero them once before the first contraction.
    patch_ref[K2:KPAD] = jnp.zeros((KPAD - K2,) + patch_ref.shape[1:], dtype)

    # cross-quarter carries: last x-maxed row per image (pool y-window
    # reaches one row up; quarter 0 carries the zero pad)
    carry = [jnp.zeros((1, qw, 64), jnp.float32) for _ in range(2)]

    for quarter in range(4):
        y0 = quarter * yh
        # --- patch build: contiguous slices of phase planes --------------
        for c in range(3):
            for dy in range(7):
                ry = (dy - 3) % 2
                dy2 = (dy - 3 - ry) // 2            # floor((dy-3)/2)
                for u in range(9):
                    rx4 = (u - 3) % 4
                    dx4 = (u - 3 - rx4) // 4        # floor((u-3)/4)
                    k = (c * 7 + dy) * 9 + u
                    pidx = (c * 2 + ry) * 4 + rx4
                    r0 = y0 + dy2 + 2               # padded row start
                    c0 = dx4 + 1                    # padded col start
                    patch_ref[k, :, 0:qw] = ph_ref[0, pidx,
                                                   r0:r0 + yh, c0:c0 + qw]
                    patch_ref[k, :, qw:2 * qw] = ph_ref[1, pidx,
                                                        r0:r0 + yh,
                                                        c0:c0 + qw]
        # --- dense contraction + folded BN + ReLU ------------------------
        acc = jax.lax.dot_general(
            patch_ref[:], w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [yh, 2qw, 128]
        acc = acc + b_ref[:].astype(jnp.float32)[None, None, :]
        acc = jnp.maximum(acc, 0.0)

        # --- fused maxpool 3x3/s2 pad 1 on this quarter, per image --------
        #   x-window {2px-1, 2px, 2px+1} = {O1[px-1], O0[px], O1[px]}
        #   y-window {2py-1, 2py, 2py+1} on the x-maxed rows; the 2py-1 row
        #   of the quarter's first output row is carried from the previous
        #   quarter.  Mosaic notes: strided slices on 3D lower to >2D
        #   gathers (rejected) and tpu.concatenate crashes on operands with
        #   different lane-offset layouts — so shifts are pltpu.roll +
        #   border masks, and the y stride-2 split is a MAJOR-dim reshape
        #   (legal) + squeeze-index.
        for i in range(2):
            o0 = acc[:, i * qw:(i + 1) * qw, 0:64]   # [yh, qw, 64]
            o1 = acc[:, i * qw:(i + 1) * qw, 64:128]
            xm = jax.lax.broadcasted_iota(jnp.int32, (yh, qw, 64), 1)
            o1prev = jnp.where(xm > 0, pltpu.roll(o1, 1, axis=1),
                               jnp.zeros_like(o1))   # O1[px-1], 0 at px=0
            xmax = jnp.maximum(jnp.maximum(o0, o1), o1prev)
            e = xmax.reshape(yh // 2, 2, qw, 64)
            even, odd = e[:, 0], e[:, 1]             # xmax[2py], xmax[2py+1]
            ym = jax.lax.broadcasted_iota(jnp.int32, (yh // 2, qw, 64), 0)
            oddprev = jnp.where(ym > 0, pltpu.roll(odd, 1, axis=0),
                                carry[i])            # xmax[2py-1]
            carry[i] = odd[yh // 2 - 1:yh // 2]      # last odd row -> next q
            out_ref[i, y0 // 2:y0 // 2 + yh // 2] = jnp.maximum(
                jnp.maximum(even, odd), oddprev).astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_conv_pool_pallas(planes: jax.Array, w2: jax.Array, bias2: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """planes [B, 3*H, W] (warp-kernel planar layout, B even), w2/bias2 from
    pack_weights_paired -> pooled stem output [B, H/4, W/4, 64] NHWC."""
    b, ch, w = planes.shape
    h = ch // 3
    assert b % 2 == 0, "stem kernel processes image pairs; pad B to even"
    dtype = planes.dtype
    hh, qw = h // 2, w // 4

    ph = s4d_planes(planes.reshape(b, 3, h, w))      # [B, 24, hh+3, qw+2]

    kernel = functools.partial(_stem_kernel, h=h, w=w, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(b // 2,),
        in_specs=[
            pl.BlockSpec((2, 24, hh + 3, qw + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, h // 4, w // 4, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 4, w // 4, 64), dtype),
        scratch_shapes=[
            pltpu.VMEM((KPAD, hh // 4, 2 * qw), dtype),
        ],
        interpret=interpret,
    )(ph, w2.astype(dtype), bias2.astype(dtype))


def stem_conv_pool_reference(x_nhwc, kernel, g, b):
    """XLA oracle: conv7x7/s2(zero pad 3) -> x*g+b -> relu -> maxpool3/s2."""
    from medseg_tpu.nn.blocks import max_pool

    y = jax.lax.conv_general_dilated(
        x_nhwc, kernel.astype(x_nhwc.dtype), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * g.astype(y.dtype) + b.astype(y.dtype), 0)
    return max_pool(y, 3, 2, padding=1)
