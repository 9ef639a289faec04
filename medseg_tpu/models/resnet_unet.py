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
from medseg_tpu.nn.s2d import depth_to_space


class ConvT2x2AsDot(nn.Module):
    """Exact re-lowering of nn.ConvTranspose(features, (2,2), strides=(2,2)):
    a channel contraction to 4*features sub-position channels followed by
    depth-to-space.

    A stride-2 2x2 transposed conv writes each output pixel from exactly ONE
    input pixel: out[2i+dy, 2j+dx] = x[i,j] @ W[1-dy, 1-dx] + b (the flip is
    flax/XLA's SAME-padding convention, pinned by tests/test_upt.py).  The
    contraction form feeds the MXU one dense [Ci, 4*Co] matmul instead of a
    kernel-2 deconv window; identical parameter tree (kernel [2,2,Ci,Co] +
    bias, same initializers), bit-comparable numerics."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        a = jnp.transpose(kernel[::-1, ::-1], (2, 0, 1, 3))
        a = a.reshape(ci, 4 * self.features)
        y = jnp.einsum("bhwc,cf->bhwf", x.astype(self.dtype),
                       a.astype(self.dtype))
        return depth_to_space(y + jnp.tile(bias, 4).astype(self.dtype))


class DecoderBlock(nn.Module):
    """ConvTranspose2x on the deep path, concat skip, DoubleConv
    (reference ResnetUnet.py:17-27).  up_as_dot selects the exact
    contraction lowering of the transposed conv (ConvT2x2AsDot)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    up_as_dot: bool = False

    @nn.compact
    def __call__(self, down, skip, train: bool = False):
        ch = down.shape[-1]
        up_cls = ConvT2x2AsDot if self.up_as_dot else _ConvT
        x = up_cls(ch, dtype=self.dtype, name="up")(down)
        x = jnp.concatenate([x, skip], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype, name="block")(x, train)


def _ConvT(features, dtype, name):
    return nn.ConvTranspose(features, (2, 2), strides=(2, 2), dtype=dtype,
                            name=name)


class ResNetUnet(nn.Module):
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32
    # up_as_dot=True lowers all five k=2/s=2 transposed convs as channel
    # contractions + depth-to-space (ConvT2x2AsDot, exact same params/math).
    # Measured SLOWER on full programs (r4 hardware A/B, profile_blocks upt:
    # seg_e2e -15%, train -11% — PERF.md post-mortem: XLA's native deconv
    # lowering wins; the hand form adds depth-to-space materialization).
    # Stays as a tested opt-in; default OFF.
    up_as_dot: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dot = self.up_as_dot
        e1, e2, e3, e4, e5 = ResNetEncoder(
            Bottleneck, (3, 4, 6, 3), dtype=self.dtype, name="encoder"
        )(x, train, taps=True)
        d5 = DecoderBlock(1024, dtype=self.dtype, up_as_dot=dot,
                          name="decoder5")(e5, e4, train)
        d4 = DecoderBlock(512, dtype=self.dtype, up_as_dot=dot,
                          name="decoder4")(d5, e3, train)
        d3 = DecoderBlock(256, dtype=self.dtype, up_as_dot=dot,
                          name="decoder3")(d4, e2, train)
        d2 = DecoderBlock(64, dtype=self.dtype, up_as_dot=dot,
                          name="decoder2")(d3, e1, train)
        up1_cls = ConvT2x2AsDot if dot else _ConvT
        d1 = up1_cls(32, dtype=self.dtype, name="up1")(d2)
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
