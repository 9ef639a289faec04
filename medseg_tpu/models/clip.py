"""CLIP zero-shot / finetunable classifier (ViT-B/32) in flax.

Behavioral twin of reference models/classification_models/CLIP.py:17-85: text
prompts are encoded once and L2-normalized; the forward pass encodes the
image, L2-normalizes, and returns `logit_scale.exp() * img @ text.T`.  The
vision-only finetune recipe (text tower frozen,
reference utils/clip_finetuner.py:91-99) is realized via the optimizer mask
in train/freeze.py rather than requires_grad surgery.

The full text tower is part of the module so HF weights round-trip through
the converter; `encode_text` is exposed to precompute prompt features, which
are then passed (or cached) as a small array — the tower itself never runs in
the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.core.registry import register_model
from medseg_tpu.nn.vit import CLIP_B32_VISION, CLIP_TEXT, TowerConfig, TextTower, VisionTower


class CLIPModule(nn.Module):
    """Two-tower CLIP with projections and logit_scale (HF CLIPModel math)."""

    vision_cfg: TowerConfig = CLIP_B32_VISION
    text_cfg: TowerConfig = CLIP_TEXT
    projection_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision = VisionTower(self.vision_cfg, dtype=self.dtype)
        self.text = TextTower(self.text_cfg, dtype=self.dtype)
        self.visual_projection = nn.Dense(self.projection_dim, use_bias=False,
                                          dtype=self.dtype)
        self.text_projection = nn.Dense(self.projection_dim, use_bias=False,
                                        dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.6592), ())

    def encode_image(self, pixels: jax.Array) -> jax.Array:
        pooled, _ = self.vision(pixels)
        return self.visual_projection(pooled)

    def encode_text(self, input_ids: jax.Array) -> jax.Array:
        return self.text_projection(self.text(input_ids))

    def __call__(self, pixels: jax.Array, input_ids: jax.Array):
        img = self.encode_image(pixels)
        txt = self.encode_text(input_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T


class CLIPClassifier(nn.Module):
    """Image side of the zero-shot classifier: logits against fixed
    (precomputed, normalized) text features — reference CLIP.py:47-65."""

    vision_cfg: TowerConfig = CLIP_B32_VISION
    projection_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision = VisionTower(self.vision_cfg, dtype=self.dtype)
        self.visual_projection = nn.Dense(self.projection_dim, use_bias=False,
                                          dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.6592), ())

    def __call__(self, pixels: jax.Array, text_features: jax.Array,
                 train: bool = False):
        """pixels: NHWC CLIP-normalized; text_features: [num_classes, dim],
        already L2-normalized."""
        pooled, _ = self.vision(pixels)
        img = self.visual_projection(pooled)
        img = img / jnp.linalg.norm(img.astype(jnp.float32), axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale.astype(jnp.float32))
        return scale * img @ text_features.astype(jnp.float32).T


@register_model("CLIP", task="classification", needs_text_features=True)
def clip_classifier(num_classes: int = 3, dtype=jnp.float32, **kw) -> CLIPClassifier:
    del num_classes  # class count is carried by the text-feature matrix
    return CLIPClassifier(dtype=dtype, **kw)
