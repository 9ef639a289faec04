"""The fused, device-resident training augmentation chain.

Replaces the per-sample CPU Albumentations pipeline (reference
utils/trainer.py:52-115) with one batched jit-compiled program: parameter
sampling, affine warp (shift/scale/rotate + horizontal flip folded into a
single matrix, so the image is resampled once), brightness/contrast, and
ImageNet normalization.  Masks ride the same affine with nearest-neighbor
sampling and no photometric ops, then scale to [0,1]
(reference utils/dataset.py:108-126).

Distributions match Albumentations: each parameter is uniform in its limit
range and gated by an independent Bernoulli(p) per sample.  RNG-stream
equality with the reference is explicitly not a goal (SURVEY.md §7) —
training-to-metric equivalence is.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from medseg_tpu.core.config import AugmentConfig
from medseg_tpu.ops import image as I


class AugmentParams(NamedTuple):
    """Per-sample augmentation draw; every field has shape (B,)."""

    angle_deg: jax.Array
    scale: jax.Array
    dx: jax.Array
    dy: jax.Array
    flip: jax.Array  # bool
    alpha: jax.Array  # contrast multiplier
    beta: jax.Array  # brightness offset, fraction of 255


def sample_augment_params(rng: jax.Array, batch: int, cfg: AugmentConfig) -> AugmentParams:
    ks = jax.random.split(rng, 9)
    apply_affine = jax.random.uniform(ks[0], (batch,)) < cfg.affine_p
    angle = jax.random.uniform(
        ks[1], (batch,), minval=-cfg.rotate_limit_deg, maxval=cfg.rotate_limit_deg
    )
    scale = 1.0 + jax.random.uniform(
        ks[2], (batch,), minval=-cfg.scale_limit, maxval=cfg.scale_limit
    )
    dx = jax.random.uniform(ks[3], (batch,), minval=-cfg.shift_limit, maxval=cfg.shift_limit)
    dy = jax.random.uniform(ks[4], (batch,), minval=-cfg.shift_limit, maxval=cfg.shift_limit)
    angle = jnp.where(apply_affine, angle, 0.0)
    scale = jnp.where(apply_affine, scale, 1.0)
    dx = jnp.where(apply_affine, dx, 0.0)
    dy = jnp.where(apply_affine, dy, 0.0)

    flip = jax.random.uniform(ks[5], (batch,)) < cfg.hflip_p

    apply_bc = jax.random.uniform(ks[6], (batch,)) < cfg.brightness_contrast_p
    alpha = 1.0 + jax.random.uniform(
        ks[7], (batch,), minval=-cfg.contrast_limit, maxval=cfg.contrast_limit
    )
    beta = jax.random.uniform(
        ks[8], (batch,), minval=-cfg.brightness_limit, maxval=cfg.brightness_limit
    )
    alpha = jnp.where(apply_bc, alpha, 1.0)
    beta = jnp.where(apply_bc, beta, 0.0)
    return AugmentParams(angle, scale, dx, dy, flip, alpha, beta)


def _combined_matrices(params: AugmentParams, h: int, w: int) -> jax.Array:
    """One dst->src matrix per sample: flip applied after shift-scale-rotate.

    Reference order is SSR then HorizontalFlip (utils/trainer.py:61-64); in
    inverse (dst->src) composition that is ssr_inv ∘ flip_inv.
    """
    ssr = I.shift_scale_rotate_matrix(
        params.angle_deg, params.scale, params.dx, params.dy, h, w
    )
    flip = jnp.broadcast_to(I.hflip_matrix(w), ssr.shape)
    ident = I.identity_affine((params.flip.shape[0],))
    flip = jnp.where(params.flip[:, None, None], flip, ident)
    return I.compose_affine(ssr, flip)


def augment_batch(
    rng: jax.Array,
    images: jax.Array,
    masks: Optional[jax.Array] = None,
    *,
    cfg: AugmentConfig = AugmentConfig(),
    out_dtype=jnp.float32,
    fast_warp: bool = True,
    s2d: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Full train-time augmentation for a uint8 NHWC batch.

    images: uint8 [B,H,W,3] already sized to the model grid (256x256).
    masks:  uint8 [B,H,W] binary 0/255 masks, or None for classification.
    Returns (normalized float images [B,H,W,3], masks float [B,H,W,1] in [0,1]).

    s2d=True emits images in space-to-depth layout [B,H/2,W/2,12] for
    models.resnet.FoldedStem: on the Pallas path the s2d shuffle replaces
    the planar->NHWC output transpose (same cost class, so the stem savings
    are kept rather than spent on an extra layout pass — PERF.md stem lever).

    fast_warp selects the gather-free two-pass warp — on TPU the
    VMEM-resident Pallas kernel (20k img/s at 256px/B=256 vs 221 img/s for
    the gather warp), elsewhere the XLA formulation; both are
    distribution-equivalent to the exact warp (sub-pixel smoothing only).
    Set False for the bit-exact single-pass gather warp.

    Backend divergence (documented train-time smoothing): on the fused TPU
    path masks warp BILINEARLY and are thresholded analytically (exactly
    equivalent to nearest except within half a pixel of region edges),
    while the XLA/CPU fallback warps masks with true nearest sampling — so
    the same (rng, batch) can differ on edge pixels across backends.
    Training-metric parity is unaffected (distributions match; the
    reference's Albumentations chain has its own resampling smoothing);
    cross-backend bit-reproducibility of masks is explicitly NOT a contract.
    """
    from medseg_tpu.ops.warp_fast import (fast_warp_supports,
                                          photometric_threshold_ok,
                                          warp_affine_fast)

    b, h, w, _ = images.shape
    params = sample_augment_params(rng, b, cfg)
    mats = _combined_matrices(params, h, w)

    # The fast warp's (PAD, MAX_SHIFT) envelope and the Pallas mask
    # threshold trick are only valid for bounded configs; widened limits
    # fall back to the exact gather warp instead of silently clipping.
    fast_warp = fast_warp and fast_warp_supports(cfg, h, w)
    use_pallas = (jax.devices()[0].platform == "tpu"
                  and (masks is None or photometric_threshold_ok(cfg)))
    if fast_warp and use_pallas:
        # Fully fused path: ONE kernel call warps image channels AND (for
        # segmentation) the mask as a 4th plane, applying the photometric
        # epilogue (brightness/contrast + normalize) in the same VMEM pass.
        # The mask plane rides the epilogue with mean=0/std=1; alpha/beta
        # keep 127.5 inside the clip's linear region, so the binary
        # threshold maps exactly to t = 127.5*alpha + beta*255 per sample
        # (bilinear warp + threshold == nearest up to half-pixel edges).
        from medseg_tpu.ops.pallas.warp_kernel import warp_affine_pallas

        mean = tuple(m * 255.0 for m in cfg.mean)
        std = tuple(s * 255.0 for s in cfg.std)
        inp = images
        if masks is not None:
            inp = jnp.concatenate([images, masks[..., None]], axis=-1)
            mean = mean + (0.0,)
            std = std + (1.0,)
        # Classification: the kernel writes the model compute dtype directly
        # (bf16 halves its HBM output traffic; epilogue math stays f32 in
        # VMEM).  Segmentation keeps f32: the mask plane is thresholded
        # against a per-sample f32 value on the way out.
        k_dtype = out_dtype if masks is None else jnp.float32
        out = warp_affine_pallas(
            inp, mats, out_dtype=k_dtype,
            alpha=params.alpha, beta=params.beta, mean=mean, std=std,
            planar=s2d and masks is None)
        if s2d and masks is None:
            # planar [B, 3*H, W] -> s2d [B, H/2, W/2, 12] in ONE transpose
            # (replaces the planar->NHWC transpose, not in addition to it)
            x = out.reshape(b, 3, h // 2, 2, w // 2, 2)
            x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, h // 2, w // 2, 12)
            return x.astype(out_dtype), None
        x = out[..., :3].astype(out_dtype)
        m = None
        if masks is not None:
            thr = (127.5 * params.alpha + params.beta * 255.0)[:, None, None]
            m = (out[..., 3] > thr).astype(out_dtype)[..., None]
        return x, m

    if fast_warp:
        x = warp_affine_fast(images, mats)
    else:
        x = I.warp_affine(images, mats, bilinear=True)
    # RandomBrightnessContrast on 0..255 values (brightness_by_max=True).
    x = x * params.alpha[:, None, None, None] \
        + params.beta[:, None, None, None] * 255.0
    x = jnp.clip(x, 0.0, 255.0)
    x = I.normalize_imagenet(x, cfg.mean, cfg.std).astype(out_dtype)
    if s2d and masks is None:
        x = I.space_to_depth(x)

    m = None
    if masks is not None:
        if fast_warp:
            m = warp_affine_fast(masks[..., None], mats, nearest=True)
        else:
            m = I.warp_affine(masks[..., None], mats, bilinear=False)
        m = (m.astype(jnp.float32) / 255.0).astype(out_dtype)
    return x, m


def preprocess_eval_batch(
    images: jax.Array,
    masks: Optional[jax.Array] = None,
    *,
    cfg: AugmentConfig = AugmentConfig(),
    out_dtype=jnp.float32,
    s2d: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Val/test preprocessing: normalize only (reference utils/trainer.py:71-83)."""
    x = I.normalize_imagenet(images, cfg.mean, cfg.std).astype(out_dtype)
    if s2d and masks is None:
        x = I.space_to_depth(x)
    m = None
    if masks is not None:
        m = (masks[..., None].astype(jnp.float32) / 255.0).astype(out_dtype)
    return x, m
