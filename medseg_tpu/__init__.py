"""medseg_tpu: a TPU-native JAX/XLA/Pallas framework for COVID-19 chest X-ray
classification and infection segmentation.

Re-designed from scratch with the behavioral surface of the reference
(bababyVN/medical-image-segmentation-and-classification): the same model zoo
(ResNet18/50, VGG16/19-BN, CLIP classifiers; ResNetUnet, AttentionUNet,
R2U-Net, R2AttU-Net, CLIPSeg segmenters), the same two-stage
freeze-then-finetune recipe, the same metric formulas and CSV result formats,
and the same cascaded classify-then-segment inference pipeline — but executed
as jit/pjit-compiled programs over a `jax.sharding.Mesh`, with a
device-resident fused augmentation pipeline and bfloat16 matmuls on the MXU.
"""

__version__ = "0.1.0"

from medseg_tpu.core.config import (  # noqa: F401
    CLASSES,
    IMG_SIZE,
    IMAGENET_MEAN,
    IMAGENET_STD,
    DataConfig,
    TrainConfig,
    EvalConfig,
)
