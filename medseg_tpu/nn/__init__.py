from medseg_tpu.nn.blocks import (  # noqa: F401
    AttentionGate,
    ClassifierHead,
    ConvBN,
    DoubleConv,
    RRCNNBlock,
    RecurrentBlock,
    UpConv,
    adaptive_avg_pool,
    global_avg_pool,
    max_pool,
    upsample_nearest2x,
)
