"""VGG16-BN / VGG19-BN classifiers, torchvision-graph-compatible.

The reference loads `vgg16_bn`/`vgg19_bn` from torch hub (its local plain-VGG
file is an unused fallback) and adapts the head via `add_dropout_to_fc`
(reference utils/helpers.py:135-144,161-166): the classifier's final Linear is
removed and Dropout(0.5)+Linear(3) appended, yielding the
[L,ReLU,Drop,L,ReLU,Drop,Drop,L3] sequence whose final layer the reference
serializes as `classifier.7` (the VGG weight-remap quirk at
utils/pipeline.py:223-238).

Config D (vgg16): 2-2-3-3-3 convs; config E (vgg19): 2-2-4-4-4.  Each conv is
3x3 pad 1 + BN + ReLU; stages end in maxpool 2x2.  torchvision inserts an
AdaptiveAvgPool2d(7) before the classifier, so any input size (224 or this
project's 256) reaches the 512*7*7 flatten.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.core.registry import register_model
from medseg_tpu.nn.blocks import adaptive_avg_pool, max_pool

VGG16_STAGES: tuple = (2, 2, 3, 3, 3)
VGG19_STAGES: tuple = (2, 2, 4, 4, 4)
STAGE_WIDTHS: tuple = (64, 128, 256, 512, 512)


class VGGFeatures(nn.Module):
    stages: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for stage, (n_convs, width) in enumerate(zip(self.stages, STAGE_WIDTHS)):
            for i in range(n_convs):
                x = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{stage}_{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn{stage}_{i}")(x)
                x = nn.relu(x)
            x = max_pool(x, 2, 2)
        return x


class VGGClassifier(nn.Module):
    stages: Sequence[int]
    num_classes: int = 3
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VGGFeatures(self.stages, dtype=self.dtype, name="features")(x, train)
        x = adaptive_avg_pool(x, 7, 7)
        # Flatten in torch's CHW order so converted Linear weights line up.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        det = not train
        # The head follows the model compute dtype (f32 params, bf16 compute
        # under dtype=bf16 — same policy as the convs); logits return in f32.
        x = nn.Dense(4096, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=det)(x)
        x = nn.Dense(4096, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=det)(x)
        # add_dropout_to_fc appends Dropout+Linear after the (kept) second
        # dropout, so train-time the head sees two stacked dropouts — faithful
        # to helpers.py:135-144.
        x = nn.Dropout(self.dropout, deterministic=det)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head_fc")(x)
        return logits.astype(jnp.float32)


@register_model("VGG16", task="classification")
def vgg16(num_classes: int = 3, dtype=jnp.float32, **kw) -> VGGClassifier:
    return VGGClassifier(VGG16_STAGES, num_classes=num_classes, dtype=dtype, **kw)


@register_model("VGG19", task="classification")
def vgg19(num_classes: int = 3, dtype=jnp.float32, **kw) -> VGGClassifier:
    return VGGClassifier(VGG19_STAGES, num_classes=num_classes, dtype=dtype, **kw)
