"""R2U-Net and R2AttU-Net: recurrent-residual U-Nets (t=5).

Graph-faithful to reference models/segmentation_models/R2U_Net.py:50-111 and
R2AttU_Net.py:88-157: encoder/decoder stages are RRCNN blocks (1x1 channel
map + two weight-tied conv recurrences + outer residual); R2AttU additionally
gates each skip with the same additive attention as AttentionUNet.  The
recurrence is weight-tied across its t+1 conv applications, so parameter
count stays small while compute is ~6x a plain double conv — these are the
FLOP-heaviest models in the zoo.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from medseg_tpu.core.registry import register_model
from medseg_tpu.nn.blocks import AttentionGate, RRCNNBlock, UpConv, max_pool
from medseg_tpu.nn.s2d import UpConvS2D


class R2UNet(nn.Module):
    out_channels: int = 1
    t: int = 5
    attention: bool = False
    use_scan: bool = False  # lax.scan recurrence: constant compile size in t
    s2d_up: bool = False  # decoder UpConvs as UpConvS2D (nn/s2d.py)
    fused_gates: bool = False  # algebraic-stats gate fusion (r4: slower in-graph)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        t = self.t
        x1 = RRCNNBlock(64, t=t, use_scan=self.use_scan, dtype=dt, name="rrcnn1")(x, train)
        x2 = RRCNNBlock(128, t=t, use_scan=self.use_scan, dtype=dt, name="rrcnn2")(max_pool(x1), train)
        x3 = RRCNNBlock(256, t=t, use_scan=self.use_scan, dtype=dt, name="rrcnn3")(max_pool(x2), train)
        x4 = RRCNNBlock(512, t=t, use_scan=self.use_scan, dtype=dt, name="rrcnn4")(max_pool(x3), train)
        x5 = RRCNNBlock(1024, t=t, use_scan=self.use_scan, dtype=dt, name="rrcnn5")(max_pool(x4), train)

        def up_stage(deep, skip, width, f_int, idx):
            up_cls = UpConvS2D if self.s2d_up else UpConv
            d = up_cls(width, dtype=dt, name=f"up{idx}")(deep, train)
            if self.attention:
                skip = AttentionGate(f_int, dtype=dt,
                                     fused_stats=self.fused_gates,
                                     name=f"att{idx}")(d, skip, train)
            d = jnp.concatenate([skip, d], axis=-1)
            return RRCNNBlock(width, t=t, use_scan=self.use_scan, dtype=dt, name=f"up_rrcnn{idx}")(d, train)

        d5 = up_stage(x5, x4, 512, 256, 5)
        d4 = up_stage(d5, x3, 256, 128, 4)
        d3 = up_stage(d4, x2, 128, 64, 3)
        d2 = up_stage(d3, x1, 64, 32, 2)
        out = nn.Conv(self.out_channels, (1, 1), name="out")(d2)
        return out.astype(jnp.float32)


@register_model("R2Unet", task="segmentation")
def r2u_net(dtype=jnp.float32, t: int = 5, **kw) -> R2UNet:
    return R2UNet(t=t, attention=False, dtype=dtype, **kw)


@register_model("R2AttUnet", task="segmentation")
def r2attu_net(dtype=jnp.float32, t: int = 5, **kw) -> R2UNet:
    return R2UNet(t=t, attention=True, dtype=dtype, **kw)
