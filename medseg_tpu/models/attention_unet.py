"""Attention U-Net: vanilla U-Net with additive attention gates on skips.

Graph-faithful to reference models/segmentation_models/AttentionUNet.py:56-120:
encoder double-convs 64-128-256-512-1024 with 2x2 maxpools; decoder UpConv
(nearest 2x + conv) + attention-gated skip concat + double conv; 1x1 output
conv to one logit channel.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.core.registry import register_model
from medseg_tpu.nn.blocks import AttentionGate, DoubleConv, UpConv, max_pool
from medseg_tpu.nn.s2d import UpConvS2D


class AttentionUNet(nn.Module):
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32
    # s2d_up=True lowers every decoder UpConv as UpConvS2D: the conv runs on
    # the un-upsampled grid with 4x output channels (exact same math and
    # param tree, zero FLOP inflation; nn/s2d.py).  Off by default pending
    # the hardware A/B (tools/profile_blocks.py).
    s2d_up: bool = False
    # fused_gates=True lowers the attention gates with algebraic-stats BN
    # fusion (nn/blocks.AttentionGate) instead of literal per-conv BN
    # passes.  Off by default: measured 2-16% SLOWER at the full-step level
    # despite a 2x isolated-block win (PERF.md r4 post-mortem).
    fused_gates: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        Up = UpConvS2D if self.s2d_up else UpConv
        x1 = DoubleConv(64, dtype=dt, name="conv1")(x, train)
        x2 = DoubleConv(128, dtype=dt, name="conv2")(max_pool(x1), train)
        x3 = DoubleConv(256, dtype=dt, name="conv3")(max_pool(x2), train)
        x4 = DoubleConv(512, dtype=dt, name="conv4")(max_pool(x3), train)
        x5 = DoubleConv(1024, dtype=dt, name="conv5")(max_pool(x4), train)

        d5 = Up(512, dtype=dt, name="up5")(x5, train)
        a4 = AttentionGate(256, dtype=dt, fused_stats=self.fused_gates,
                           name="att5")(d5, x4, train)
        d5 = DoubleConv(512, dtype=dt, name="up_conv5")(
            jnp.concatenate([a4, d5], axis=-1), train)

        d4 = Up(256, dtype=dt, name="up4")(d5, train)
        a3 = AttentionGate(128, dtype=dt, fused_stats=self.fused_gates,
                           name="att4")(d4, x3, train)
        d4 = DoubleConv(256, dtype=dt, name="up_conv4")(
            jnp.concatenate([a3, d4], axis=-1), train)

        d3 = Up(128, dtype=dt, name="up3")(d4, train)
        a2 = AttentionGate(64, dtype=dt, fused_stats=self.fused_gates,
                           name="att3")(d3, x2, train)
        d3 = DoubleConv(128, dtype=dt, name="up_conv3")(
            jnp.concatenate([a2, d3], axis=-1), train)

        d2 = Up(64, dtype=dt, name="up2")(d3, train)
        a1 = AttentionGate(32, dtype=dt, fused_stats=self.fused_gates,
                           name="att2")(d2, x1, train)
        d2 = DoubleConv(64, dtype=dt, name="up_conv2")(
            jnp.concatenate([a1, d2], axis=-1), train)

        out = nn.Conv(self.out_channels, (1, 1), name="out")(d2)
        return out.astype(jnp.float32)


@register_model("AttentionUNet", task="segmentation")
def attention_unet(dtype=jnp.float32, **kw) -> AttentionUNet:
    return AttentionUNet(dtype=dtype, **kw)
