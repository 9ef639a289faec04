"""ResNetUnet: ResNet-50 encoder + transposed-conv decoder with skip concats.

Graph-faithful to reference models/segmentation_models/ResnetUnet.py:17-83:
encoder taps at post-stem (pre-pool) and layers 1-4; each decoder block
upsamples the deep path with ConvTranspose(k=2,s=2), concatenates the skip,
and applies a double conv; a final ConvTranspose(64->32)+Conv+BN+ReLU and
1x1 conv produce one logit channel at full resolution.  The encoder is
freezable (reference default freeze=True, ResnetUnet.py:30,45-46) — realized
here through the optimizer mask (train/freeze.py), not parameter surgery.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.core.registry import register_model
from medseg_tpu.models.resnet import Bottleneck, ResNetEncoder
from medseg_tpu.nn.blocks import DoubleConv


class DecoderBlock(nn.Module):
    """ConvTranspose2x on the deep path, concat skip, DoubleConv
    (reference ResnetUnet.py:17-27)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, down, skip, train: bool = False):
        ch = down.shape[-1]
        x = nn.ConvTranspose(ch, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="up")(down)
        x = jnp.concatenate([x, skip], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype, name="block")(x, train)


class ResNetUnet(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        e1, e2, e3, e4, e5 = ResNetEncoder(
            Bottleneck, (3, 4, 6, 3), dtype=self.dtype, name="encoder"
        )(x, train, taps=True)
        d5 = DecoderBlock(1024, dtype=self.dtype, name="decoder5")(e5, e4, train)
        d4 = DecoderBlock(512, dtype=self.dtype, name="decoder4")(d5, e3, train)
        d3 = DecoderBlock(256, dtype=self.dtype, name="decoder3")(d4, e2, train)
        d2 = DecoderBlock(64, dtype=self.dtype, name="decoder2")(d3, e1, train)
        d1 = nn.ConvTranspose(32, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="up1")(d2)
        d1 = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                     name="conv1")(d1)
        d1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="bn1")(d1)
        d1 = nn.relu(d1)
        out = nn.Conv(self.n_classes, (1, 1), name="out")(d1)
        return out.astype(jnp.float32)


@register_model("ResNetUnet", task="segmentation", encoder_frozen=True)
def resnet_unet(dtype=jnp.float32, **kw) -> ResNetUnet:
    return ResNetUnet(dtype=dtype, **kw)
