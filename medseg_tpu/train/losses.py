"""Loss functions with the reference's exact semantics.

- cross_entropy: label_smoothing=0.1 mean CE (reference utils/helpers.py:244-246,
  torch CrossEntropyLoss smoothing convention: target = (1-eps)*onehot + eps/K)
- bce_with_logits: mean over all elements (torch BCEWithLogitsLoss default)
- dice_loss / combined_loss: reference utils/clip_seg_finetuner.py:40-74
  (sigmoid, flatten, smooth=1.0; combined = 0.5*BCE + 0.5*Dice)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def per_sample_cross_entropy(logits: jax.Array, labels: jax.Array,
                             label_smoothing: float = 0.0) -> jax.Array:
    """[B] CE vector — masked/trimmed aggregation is the caller's choice
    (mesh val loops mask out pad rows; see valid_mask)."""
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    return optax.softmax_cross_entropy(logits, onehot)


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  label_smoothing: float = 0.0) -> jax.Array:
    return per_sample_cross_entropy(logits, labels, label_smoothing).mean()


def valid_mask(batch: int, n_valid) -> jax.Array:
    """[B] float mask: 1.0 for the first n_valid rows, 0.0 for pad rows.

    Sharded val/eval loaders pad ragged tails by repeating the last sample
    (data/loader.py pad_to_multiple); masked losses over this are exactly the
    trimmed single-device values (pad rows contribute literal 0.0 terms)."""
    return (jnp.arange(batch) < n_valid).astype(jnp.float32)


def masked_bce_with_logits(logits: jax.Array, targets: jax.Array,
                           valid: jax.Array) -> jax.Array:
    """Mean BCE over valid samples only; equals
    bce_with_logits(logits[:n], targets[:n]) for valid = n ones + pad zeros."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per_elem = optax.sigmoid_binary_cross_entropy(logits, targets)
    v = valid.reshape((-1,) + (1,) * (per_elem.ndim - 1))
    elems_per_sample = per_elem[0].size
    return (per_elem * v).sum() / jnp.maximum(valid.sum() * elems_per_sample,
                                              1.0)


def masked_dice_loss(logits: jax.Array, targets: jax.Array, valid: jax.Array,
                     smooth: float = 1.0) -> jax.Array:
    v = valid.reshape((-1,) + (1,) * (logits.ndim - 1))
    p = jax.nn.sigmoid(logits.astype(jnp.float32)) * v
    t = targets.astype(jnp.float32) * v
    inter = (p * t).sum()
    dice = (2.0 * inter + smooth) / (p.sum() + t.sum() + smooth)
    return 1.0 - dice


def masked_combined_loss(logits: jax.Array, targets: jax.Array,
                         valid: jax.Array, bce_weight: float = 0.5,
                         dice_weight: float = 0.5) -> jax.Array:
    return (bce_weight * masked_bce_with_logits(logits, targets, valid)
            + dice_weight * masked_dice_loss(logits, targets, valid))


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean()


def dice_loss(logits: jax.Array, targets: jax.Array, smooth: float = 1.0) -> jax.Array:
    p = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1)
    t = targets.astype(jnp.float32).reshape(-1)
    inter = (p * t).sum()
    dice = (2.0 * inter + smooth) / (p.sum() + t.sum() + smooth)
    return 1.0 - dice


def combined_loss(logits: jax.Array, targets: jax.Array,
                  bce_weight: float = 0.5, dice_weight: float = 0.5) -> jax.Array:
    return bce_weight * bce_with_logits(logits, targets) + dice_weight * dice_loss(
        logits, targets)


def batch_iou(probs: jax.Array, targets: jax.Array, threshold: float = 0.5) -> jax.Array:
    """Batch-level IoU used for the training-loop val metric
    (reference utils/helpers.py:223-227 — whole-batch, not per-sample)."""
    p = (probs > threshold).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    inter = (p * t).sum()
    union = ((p + t) > 0).astype(jnp.float32).sum()
    return inter / (union + 1e-7)


def masked_batch_iou(probs: jax.Array, targets: jax.Array, valid: jax.Array,
                     threshold: float = 0.5) -> jax.Array:
    """batch_iou over valid samples only (pad rows zero out of both sums)."""
    v = valid.reshape((-1,) + (1,) * (probs.ndim - 1))
    p = (probs > threshold).astype(jnp.float32) * v
    t = targets.astype(jnp.float32) * v
    inter = (p * t).sum()
    union = ((p + t) > 0).astype(jnp.float32).sum()
    return inter / (union + 1e-7)
