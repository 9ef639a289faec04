"""Gather-free affine warp: the TPU-native ShiftScaleRotate kernel.

Why: the straightforward bilinear warp is 4 data-dependent gathers per output
pixel; on TPU that compiles to scalar gather loops (~221 img/s measured at
256px batch 256 — two orders of magnitude below the MXU-resident model
forward).  This module reformulates the warp with zero gathers:

1. Reflect-101 pad the image by P so every sampled coordinate of the
   bounded transform family (|rot| <= 15deg, scale 1 +/- 0.05, shift 0.05 —
   reference utils/trainer.py:61-63) lands inside the padded canvas; wrap
   artifacts from circular rolls land outside the final crop.
2. Factor the inverse affine into horizontal-then-vertical 1-D affine
   resamples (Catmull-Smith two-pass decomposition; valid while m11 != 0,
   always true for this family).
3. Each 1-D resample `src = alpha*t + offset(cross)` splits into:
   - a per-image dense interpolation-matrix product (hat weights built from
     traced scalars, contracted on the MXU), which absorbs the scale and the
     mean offset, and
   - a per-line residual shift (linear in the cross coordinate), applied as
     two-level masked circular rolls (stride-8 coarse + fine+fractional),
     all VPU elementwise work.

The result is distribution-faithful to the single-pass bilinear warp up to
one extra linear-interpolation smoothing (validated in tests against
ops/image.warp_affine); val/test paths never warp, so metric parity is
untouched (SURVEY.md §7 'Random aug parity').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Padding that contains max displacement for the SSR family at 256px:
# |src - dst| <= |R^-1 - I| * sqrt(2)*128 + 0.05*256 ~= 73px.
PAD = 80
# Residual per-line shift bound after the matmul absorbs the mean offset:
# slope <= tan(15deg) ~= 0.27, half-extent of padded 416px canvas = 208
# -> |shift| <= 62; two-level decomposition with stride 8.
MAX_SHIFT = 64
COARSE = 8


def fast_warp_supports(cfg, h: int, w: int) -> bool:
    """Does the (PAD, MAX_SHIFT) envelope contain every transform this
    AugmentConfig can sample?  The fast warp's bounds were derived for the
    default limits; widened configs must fall back to the exact gather warp
    or they would silently clip shifts / corrupt warped pixels (ADVICE r1).

    Conservative worst-case over the sampled family (rotate <= theta,
    scale in [1-s, 1+s], shift <= f of the image size, optional hflip —
    flips only change signs, not magnitudes):
    - corner displacement  r*|R(-theta)/smin - I| + f*n/smin  must fit PAD
    - residual per-line shifts of the two 1-D passes
      (smax*sin(theta), tan(theta)) * (padded extent)/2  must fit MAX_SHIFT
    """
    import math

    theta = math.radians(abs(cfg.rotate_limit_deg))
    smin = 1.0 - abs(cfg.scale_limit)
    smax = 1.0 + abs(cfg.scale_limit)
    if smin <= 0.1 or theta >= math.radians(45.0):
        return False
    n = float(max(h, w))
    r = math.hypot(h, w) / 2.0
    disp = r * math.hypot(math.cos(theta) / smin - 1.0,
                          math.sin(theta) / smin) \
        + abs(cfg.shift_limit) * n / smin
    if disp > PAD - 1.0:
        return False
    half_padded = (n + 2 * PAD) / 2.0
    delta_h = smax * math.sin(theta) * half_padded
    delta_v = math.tan(theta) * half_padded
    return max(delta_h, delta_v) <= MAX_SHIFT - 1.0


def photometric_threshold_ok(cfg) -> bool:
    """The fused Pallas mask trick binarizes via t = 127.5*alpha + beta*255,
    which assumes t stays strictly inside (0, 255) (the clip's linear
    region).  Holds iff contrast_limit + 2*brightness_limit < 1."""
    return (abs(cfg.contrast_limit) + 2.0 * abs(cfg.brightness_limit)) < 1.0


def _interp_matrix(alpha, offset, n_out: int, n_in: int, nearest: bool = False):
    """[n_out, n_in] resampling matrix from traced scalars: row o samples
    source coordinate alpha*o + offset (hat weights, or a single 1 at the
    rounded coordinate for nearest/mask sampling)."""
    o = jax.lax.broadcasted_iota(jnp.float32, (n_out, 1), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (1, n_in), 1)
    src = alpha * o + offset
    if nearest:
        return (jnp.floor(src + 0.5) == i).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - i))


def _masked_shift(x, delta, axis: int, nearest: bool = False):
    """Shift line `t` of `x` by delta[t] (fractional, |delta|<MAX_SHIFT)
    along `axis`, where lines are indexed by the OTHER spatial axis.

    x: [B, H, W] (single channel plane batch); axis=2 shifts each row
    horizontally with delta [B, H]; axis=1 shifts each column vertically
    with delta [B, W].  Sampling convention: out[t] = x[t + delta].
    """
    if nearest:
        delta = jnp.floor(delta + 0.5)
    k = jnp.floor(delta)
    frac = delta - k
    k = k.astype(jnp.int32)
    q = k // COARSE            # coarse steps in [-8, 8]
    r = k - q * COARSE         # fine remainder in [0, 8)

    if axis == 2:
        qb = q[:, :, None]
        rb = r[:, :, None]
        fb = frac[:, :, None]
    else:
        qb = q[:, None, :]
        rb = r[:, None, :]
        fb = frac[:, None, :]

    n_coarse = MAX_SHIFT // COARSE  # 8
    t1 = jnp.zeros_like(x)
    for qq in range(-n_coarse, n_coarse + 1):
        # out[t] = x[t + s]  ==  roll(x, -s)
        t1 = t1 + jnp.where(qb == qq, jnp.roll(x, -qq * COARSE, axis=axis), 0.0)
    out = jnp.zeros_like(x)
    for rr in range(COARSE + 1):
        w = (rb == rr) * (1.0 - fb) + (rb == rr - 1) * fb
        out = out + w * jnp.roll(t1, -rr, axis=axis)
    return out


def _pass_1d(x, alpha, offset0, slope, axis: int, nearest: bool = False):
    """1-D affine resample along `axis`: src = alpha*t + offset0 + slope*cross.

    x: [B, H, W] planes.  The mean offset rides the interpolation matmul; the
    cross-linear residual rides the masked shifts (in post-scale units).
    """
    b, h, w = x.shape
    n = w if axis == 2 else h
    n_cross = h if axis == 2 else w
    mid = (n_cross - 1) * 0.5
    off_mid = offset0 + slope * mid

    mat = jax.vmap(lambda a, o: _interp_matrix(a, o, n, n, nearest))(alpha, off_mid)
    if axis == 2:
        scaled = jnp.einsum("bou,bhu->bho", mat, x)
        cross = jax.lax.broadcasted_iota(jnp.float32, (1, h), 1)
    else:
        scaled = jnp.einsum("bou,buw->bow", mat, x)
        cross = jax.lax.broadcasted_iota(jnp.float32, (1, w), 1)
    delta = slope[:, None] * (cross - mid) / alpha[:, None]  # [B, n_cross]
    delta = jnp.clip(delta, -(MAX_SHIFT - 1.0), MAX_SHIFT - 1.0)
    return _masked_shift(scaled, delta, axis, nearest)


def warp_affine_fast(images: jax.Array, matrices: jax.Array,
                     nearest: bool = False) -> jax.Array:
    """Batched gather-free affine warp.

    images: [B, H, W, C] (any real dtype); matrices: [B, 2, 3] dst->src
    affines in unpadded coordinates (same convention as ops/image.warp_affine).
    `nearest=True` uses nearest sampling in both passes (masks stay binary).
    Returns float32 [B, H, W, C].
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
    # Padded-coordinate offsets: src' = M2 @ dst' + (m_off + P*(1 - row sums)).
    m02p = m02 + PAD * (1.0 - m00 - m01)
    m12p = m12 + PAD * (1.0 - m10 - m11)

    # Catmull-Smith factorization (horizontal pass h, then vertical pass g):
    #   g(x,y)   = m11*y + m10*x + m12'
    #   h(u,y)   = a*u + b*y + c with b = m01/m11, a = m00 - b*m10,
    #              c = m02' - b*m12'
    bb = m01 / m11
    aa = m00 - bb * m10
    cc = m02p - bb * m12p

    # planes: [B*C, Hp, Wp] so both passes batch over channels
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(b * c, hp, wp)

    def rep(v):
        return jnp.repeat(v, c, axis=0)

    # Pass A: horizontal. src_x = a*u + b*y + c  (cross = row index y)
    tmp = _pass_1d(planes, rep(aa), rep(cc), rep(bb), axis=2, nearest=nearest)
    # Pass B: vertical. src_y = m11*y + m10*x + m12' (cross = column x)
    out = _pass_1d(tmp, rep(m11), rep(m12p), rep(m10), axis=1, nearest=nearest)

    out = out.reshape(b, c, hp, wp).transpose(0, 2, 3, 1)
    return out[:, PAD:PAD + h, PAD:PAD + w, :]
