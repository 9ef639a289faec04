"""CLIP-style transformer towers in flax.linen, HF-weight-compatible.

Implements the math of HF `CLIPModel` (openai/clip-vit-base-patch32) and the
shared backbone of `CLIPSegForImageSegmentation` so the interop converters
(medseg_tpu/interop/hf_clip.py) can load HF checkpoints bit-faithfully:

- vision tower: patch conv (no bias) + CLS + learned positions (with bicubic
  position interpolation for off-native resolutions, as CLIPSeg uses at 352),
  pre-LN transformer (quick-gelu MLP), post-LN pooled CLS
- text tower: token + position embeddings, causal pre-LN transformer, final
  LN, pooled at the EOS position
- attention: standard MHA, q scaled by head_dim**-0.5, all projections biased

Sequence lengths here are tiny (<=485 visual tokens, 77 text tokens), so
plain dot-product attention is the right TPU kernel — XLA fuses the softmax;
flash/ring attention would add nothing (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    # vision-only
    image_size: int = 224
    patch_size: int = 32
    # text-only
    vocab_size: int = 49408
    max_positions: int = 77
    eos_token_id: int = 49407


# ViT-B/32 CLIP (openai/clip-vit-base-patch32)
CLIP_B32_VISION = TowerConfig(768, 12, 12, 3072, image_size=224, patch_size=32)
CLIP_TEXT = TowerConfig(512, 12, 8, 2048)
# ViT-B/16 backbone used by CIDAS/clipseg-rd64-refined (pos embeds trained at
# 224, run at 352 via interpolation).
CLIP_B16_VISION = TowerConfig(768, 12, 12, 3072, image_size=224, patch_size=16)


def activation(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    raise ValueError(name)


class Attention(nn.Module):
    """MHA via jax.nn.dot_product_attention (XLA's fused attention path;
    flash-style kernels add nothing at these sequence lengths)."""

    hidden: int
    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        b, s, _ = x.shape
        head_dim = self.hidden // self.heads
        dense = lambda name: nn.Dense(self.hidden, dtype=self.dtype, name=name)  # noqa: E731
        q = dense("q_proj")(x).reshape(b, s, self.heads, head_dim)
        k = dense("k_proj")(x).reshape(b, s, self.heads, head_dim)
        v = dense("v_proj")(x).reshape(b, s, self.heads, head_dim)
        out = jax.nn.dot_product_attention(q, k, v, bias=mask)
        out = out.reshape(b, s, self.hidden)
        return dense("out_proj")(out)


class MLP(nn.Module):
    hidden: int
    intermediate: int
    act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(x)
        x = activation(self.act)(x)
        return nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x)


class EncoderLayer(nn.Module):
    """Pre-norm (CLIP encoder) or post-norm (CLIPSeg decoder) block."""

    cfg: TowerConfig
    post_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        ln1 = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, dtype=self.dtype, name="ln1")
        ln2 = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, dtype=self.dtype, name="ln2")
        attn = Attention(self.cfg.hidden_size, self.cfg.num_heads, dtype=self.dtype, name="attn")
        mlp = MLP(self.cfg.hidden_size, self.cfg.intermediate_size, self.cfg.hidden_act,
                  dtype=self.dtype, name="mlp")
        if self.post_norm:
            x = ln1(x + attn(x, mask))
            x = ln2(x + mlp(x))
        else:
            x = x + attn(ln1(x), mask)
            x = x + mlp(ln2(x))
        return x


class VisionTower(nn.Module):
    """CLIP vision transformer; returns (pooled_pre_projection, hidden_states).

    hidden_states[0] is the embedding output; hidden_states[i] the output of
    layer i — matching HF's `output_hidden_states` indexing so CLIPSeg's
    `hidden_states[i + 1]` extract-layer convention carries over.
    """

    cfg: TowerConfig
    dtype: jnp.dtype = jnp.float32

    def interpolated_positions(self, pos_embed: jax.Array, grid: int) -> jax.Array:
        """Bicubic-resample patch position embeddings to a new grid
        (HF CLIPSegVisionEmbeddings.interpolate_pos_encoding)."""
        native = self.cfg.image_size // self.cfg.patch_size
        if grid == native:
            return pos_embed
        cls_pos = pos_embed[:1]
        patch = pos_embed[1:].reshape(native, native, -1)
        patch = jax.image.resize(patch, (grid, grid, patch.shape[-1]), method="bicubic")
        return jnp.concatenate([cls_pos, patch.reshape(grid * grid, -1)], axis=0)

    @nn.compact
    def __call__(self, pixels: jax.Array):
        """pixels: NHWC float (CLIP-normalized)."""
        cfg = self.cfg
        b, h, w, _ = pixels.shape
        grid = h // cfg.patch_size
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(pixels)
        x = x.reshape(b, grid * grid, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_pos, cfg.hidden_size))
        x = x + self.interpolated_positions(pos, grid).astype(x.dtype)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layernorm")(x)
        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = EncoderLayer(cfg, dtype=self.dtype, name=f"layer{i}")(x)
            hidden_states.append(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0])
        return pooled, hidden_states


class TextTower(nn.Module):
    """CLIP text transformer; returns pooled (pre-projection) EOS embedding."""

    cfg: TowerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        cfg = self.cfg
        b, s = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.hidden_size))
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.max_positions, cfg.hidden_size))
        x = jnp.take(tok, input_ids, axis=0).astype(self.dtype)
        x = x + pos[:s].astype(self.dtype)
        causal = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
        causal = causal[None, None]
        for i in range(cfg.num_layers):
            x = EncoderLayer(cfg, dtype=self.dtype, name=f"layer{i}")(x, causal)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layernorm")(x)
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        return x[jnp.arange(b), eos_pos]
