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


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  label_smoothing: float = 0.0) -> jax.Array:
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    return optax.softmax_cross_entropy(logits, onehot).mean()


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
