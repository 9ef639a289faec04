"""ResNet-18/50 classifiers, torchvision-graph-compatible, in flax.linen.

The reference's primary path loads torchvision hub ResNets and swaps the head
for Dropout(0.5)+Linear(3) (reference utils/helpers.py:148-192); its local
from-scratch ResNet.py is a buggy fallback that the published metrics never
used (SURVEY.md §2.2).  We therefore implement the canonical torchvision
graph — stem conv7x7/s2 + BN + ReLU + maxpool3x3/s2, four stages of
BasicBlock (18) or Bottleneck (50), global average pool — so the interop
converter (medseg_tpu/interop/torch_cnn.py) can load torchvision
`IMAGENET1K_V1` state dicts bit-faithfully.

Layout is NHWC and compute dtype is configurable (bfloat16 on TPU).  The
classification head exposes the `head` param scope used by the two-stage
freeze schedule (train/freeze.py).
"""

from __future__ import annotations

from typing import Sequence, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.core.registry import register_model
from medseg_tpu.nn.blocks import ClassifierHead, global_avg_pool, max_pool


class FoldedStem(nn.Module):
    """The 7x7/s2 stem evaluated on space-to-depth input.

    3-input-channel convs waste the 256-lane MXU (the stem alone was 58% of
    the r1 ResNet18 forward, PERF.md); in s2d layout ([B,H/2,W/2,12], channel
    order c*4+dy*2+dx — ops.image.space_to_depth) the SAME canonical
    (7,7,3,64) `kernel` param is zero-padded to 8x8 and refolded at apply
    time into a (4,4,12,64) stride-1 conv.  Param tree and numerics are
    identical to the standard stem, so checkpoints/converters are untouched.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s2d):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, 64))
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = kp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 4, 1, 3, 5)
        k = k.reshape(4, 4, 12, 64).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x_s2d.astype(self.dtype), k, window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = bn("down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output channels = 4 * features
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        # torchvision places the stride on the 3x3 conv.
        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            identity = bn("down_bn")(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """The convolutional trunk; returns the final feature map (NHWC).

    `taps=True` additionally returns the five intermediate activations used
    by ResNetUnet (reference models/segmentation_models/ResnetUnet.py:68-74):
    post-stem (pre-pool), and the outputs of the four stages.
    """

    block: Type[nn.Module]
    stage_sizes: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    stem_s2d: bool = False  # expect space-to-depth input (FoldedStem)

    @nn.compact
    def __call__(self, x, train: bool = False, taps: bool = False,
                 skip_stem: bool = False):
        if skip_stem:
            # x is already the post-stem pooled map [B, H/4, W/4, 64]
            # (produced by ops.pallas.stem_kernel via apply_with_pallas_stem;
            # conv1/bn1 params stay in the tree, untouched).  Incompatible
            # with taps (ResNetUnet needs the pre-pool e1 activation).
            assert not taps, "skip_stem cannot provide the pre-pool tap"
            e1 = None
            feats = []
        else:
            if self.stem_s2d:
                x = FoldedStem(dtype=self.dtype, name="conv1")(x)
            else:
                x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                            use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
            e1 = nn.relu(x)
            x = max_pool(e1, 3, 2, padding=1)
            feats = [e1]
        widths = (64, 128, 256, 512)
        expansion = getattr(self.block, "expansion", 1)
        in_ch = 64
        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for i in range(n_blocks):
                stride = 2 if (i == 0 and stage > 0) else 1
                out_ch = width * expansion
                down = i == 0 and (stride != 1 or in_ch != out_ch)
                x = self.block(width, stride=stride, downsample=down,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{i}")(x, train)
                in_ch = out_ch
            feats.append(x)
        if taps:
            return feats  # [e1(128px,64ch), e2, e3, e4, e5]
        return x


class ResNetClassifier(nn.Module):
    """ResNet trunk + Dropout/Linear 3-class head (utils/helpers.py:124-134)."""

    block: Type[nn.Module]
    stage_sizes: Sequence[int]
    num_classes: int = 3
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, skip_stem: bool = False):
        x = ResNetEncoder(self.block, self.stage_sizes, dtype=self.dtype,
                          stem_s2d=self.stem_s2d, name="encoder")(
                              x, train, skip_stem=skip_stem)
        x = global_avg_pool(x).astype(jnp.float32)
        return ClassifierHead(self.num_classes, self.dropout, name="head")(x, train)


@register_model("ResNet18", task="classification")
def resnet18(num_classes: int = 3, dtype=jnp.float32, **kw) -> ResNetClassifier:
    return ResNetClassifier(BasicBlock, (2, 2, 2, 2), num_classes=num_classes,
                            dtype=dtype, **kw)


@register_model("ResNet50", task="classification")
def resnet50(num_classes: int = 3, dtype=jnp.float32, **kw) -> ResNetClassifier:
    return ResNetClassifier(Bottleneck, (3, 4, 6, 3), num_classes=num_classes,
                            dtype=dtype, **kw)


def resnet50_encoder(dtype=jnp.float32) -> ResNetEncoder:
    """Bare ResNet-50 trunk for the ResNetUnet encoder."""
    return ResNetEncoder(Bottleneck, (3, 4, 6, 3), dtype=dtype)


def apply_with_pallas_stem(model: ResNetClassifier, variables, x,
                           planar: bool = False, interpret: bool = False):
    """Inference forward with the fused Pallas stem kernel
    (ops/pallas/stem_kernel.py): folds this checkpoint's bn1 running stats
    into conv1's weights, runs conv+BN+ReLU+maxpool in one VMEM pass, and
    feeds the pooled map into the unchanged deep stages via skip_stem.

    x: [B, H, W, 3] model-input images (normalized), or the warp kernel's
    planar [B, 3H, W] layout when planar=True (the fused aug+infer path —
    the NHWC transpose never materializes).  B must be even (kernel
    processes image pairs).  Param tree/checkpoints are untouched; parity
    with model.apply(variables, x) is tested in tests/test_stem_kernel.py.
    """
    from medseg_tpu.ops.pallas.stem_kernel import (fold_bn,
                                                   pack_weights_paired,
                                                   stem_conv_pool_pallas)

    enc_p = variables["params"]["encoder"]
    enc_s = variables["batch_stats"]["encoder"]
    g, b = fold_bn(enc_p["bn1"]["scale"], enc_p["bn1"]["bias"],
                   enc_s["bn1"]["mean"], enc_s["bn1"]["var"])
    w2, b2 = pack_weights_paired(enc_p["conv1"]["kernel"], g, b)
    if not planar:
        bsz, h, w, _ = x.shape
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(bsz, 3 * h, w)
    pooled = stem_conv_pool_pallas(x.astype(model.dtype), w2, b2,
                                   interpret=interpret)
    return model.apply(variables, pooled, False, skip_stem=True)
