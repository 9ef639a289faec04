"""CLIPSeg text-prompted segmentation (CIDAS/clipseg-rd64-refined) in flax.

Behavioral twin of reference models/segmentation_models/CLIPSeg.py:13-103 and
the HF architecture it wraps: a frozen CLIP ViT-B/16 backbone run at 352x352
(224-trained position embeddings bicubic-interpolated), activations extracted
after encoder layers [3, 6, 9], each reduced 768->64; the deepest activation
is FiLM-conditioned by the text embedding (film_mul/film_add), three post-norm
relu-MLP transformer layers (width 64, 4 heads, mlp 2048) refine it, and the
"refined" transposed-conv head (Conv3x3+ReLU, ConvT k4s4 64->32, ReLU,
ConvT k4s4 32->1) upsamples patch tokens to 352x352 logits.

The vision encoder runs under stop_gradient, matching HF's `torch.no_grad()`
wrapper; the decoder-only finetune recipe (utils/clip_seg_finetuner.py:125-132)
falls out of that plus the optimizer mask.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.core.registry import register_model
from medseg_tpu.nn.vit import (
    CLIP_B16_VISION,
    CLIP_TEXT,
    EncoderLayer,
    TextTower,
    TowerConfig,
    VisionTower,
)

class CLIPSegDecoder(nn.Module):
    """Reduce + FiLM + post-norm transformer + transposed-conv upsampling."""

    reduce_dim: int = 64
    extract_depth: int = 3
    conditional_layer: int = 0
    patch_size: int = 16
    num_heads: int = 4
    intermediate_size: int = 2048
    dtype: jnp.dtype = jnp.float32

    @property
    def layer_cfg(self) -> TowerConfig:
        return TowerConfig(
            hidden_size=self.reduce_dim, num_layers=self.extract_depth,
            num_heads=self.num_heads, intermediate_size=self.intermediate_size,
            hidden_act="relu")

    @nn.compact
    def __call__(self, activations: Sequence[jax.Array], cond: jax.Array):
        """activations: shallow-to-deep hidden states [B, 1+S, 768] from the
        extract layers; cond: [B, 512] text embedding."""
        acts = list(activations)[::-1]  # deepest first (HF order)
        output = None
        for i, act in enumerate(acts):
            red = nn.Dense(self.reduce_dim, dtype=self.dtype, name=f"reduce{i}")(act)
            output = red if output is None else red + output
            if i == self.conditional_layer:
                mul = nn.Dense(self.reduce_dim, dtype=self.dtype, name="film_mul")(cond)
                add = nn.Dense(self.reduce_dim, dtype=self.dtype, name="film_add")(cond)
                output = mul[:, None, :] * output + add[:, None, :]
            output = EncoderLayer(self.layer_cfg, post_norm=True,
                                  dtype=self.dtype, name=f"layer{i}")(output)

        tokens = output[:, 1:, :]  # drop CLS
        b, s, c = tokens.shape
        size = int(round(s ** 0.5))
        x = tokens.reshape(b, size, size, c)
        k = self.patch_size // 4
        x = nn.Conv(self.reduce_dim, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="head_conv")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(self.reduce_dim // 2, (k, k), strides=(k, k),
                             dtype=self.dtype, name="head_up1")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(1, (k, k), strides=(k, k), dtype=self.dtype,
                             name="head_up2")(x)
        return x[..., 0].astype(jnp.float32)  # [B, H, W] logits (HF squeezes ch)


class CLIPSegModel(nn.Module):
    """Full text-prompted segmenter; returns [B, H, W] logits."""

    vision_cfg: TowerConfig = CLIP_B16_VISION
    text_cfg: TowerConfig = CLIP_TEXT
    projection_dim: int = 512
    extract_layers: Sequence[int] = (3, 6, 9)
    reduce_dim: int = 64
    decoder_heads: int = 4
    decoder_intermediate: int = 2048
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
        self.decoder = CLIPSegDecoder(
            reduce_dim=self.reduce_dim,
            extract_depth=len(self.extract_layers),
            patch_size=self.vision_cfg.patch_size,
            num_heads=self.decoder_heads,
            intermediate_size=self.decoder_intermediate,
            dtype=self.dtype,
        )

    def encode_text(self, input_ids: jax.Array) -> jax.Array:
        """Conditional (FiLM) embedding: projected pooled text features."""
        return self.text_projection(self.text(input_ids))

    def __call__(self, pixels: jax.Array, input_ids: Optional[jax.Array] = None,
                 cond: Optional[jax.Array] = None, train: bool = False):
        """pixels: NHWC CLIP-normalized 352x352; provide token ids OR a
        precomputed conditional embedding [B or 1, 512]."""
        _, hidden = self.vision(pixels)
        # hidden[i+1] = output of encoder layer i+1; HF extracts i+1 for i in
        # extract_layers (modeling_clipseg.py: `hidden_states[i + 1]`).
        acts = [hidden[i + 1] for i in self.extract_layers]
        # Backbone is frozen by construction (HF runs it under no_grad).
        acts = [jax.lax.stop_gradient(a) for a in acts]
        if cond is None:
            if input_ids is None:
                raise ValueError("need input_ids or cond")
            cond = self.encode_text(input_ids)
            cond = jax.lax.stop_gradient(cond)
        if cond.shape[0] == 1 and pixels.shape[0] != 1:
            cond = jnp.broadcast_to(cond, (pixels.shape[0], cond.shape[1]))
        return self.decoder(acts, cond)


@register_model("CLIPSeg", task="segmentation", needs_text_features=True)
def clipseg(dtype=jnp.float32, **kw) -> CLIPSegModel:
    return CLIPSegModel(dtype=dtype, **kw)
