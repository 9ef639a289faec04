"""Model zoo, registry-keyed by the reference's model names.

Importing this package registers: ResNet18, ResNet50, VGG16, VGG19, CLIP
(classification); ResNetUnet, AttentionUNet, R2Unet, R2AttUnet, CLIPSeg
(segmentation).
"""

from medseg_tpu.core.registry import get_model, list_models  # noqa: F401
from medseg_tpu.models import resnet  # noqa: F401
from medseg_tpu.models import vgg  # noqa: F401
from medseg_tpu.models import resnet_unet  # noqa: F401
from medseg_tpu.models import attention_unet  # noqa: F401
from medseg_tpu.models import r2u_net  # noqa: F401
from medseg_tpu.models import clip  # noqa: F401
from medseg_tpu.models import clipseg  # noqa: F401

from medseg_tpu.models.resnet import ResNetClassifier  # noqa: F401
from medseg_tpu.models.vgg import VGGClassifier  # noqa: F401
from medseg_tpu.models.resnet_unet import ResNetUnet  # noqa: F401
from medseg_tpu.models.attention_unet import AttentionUNet  # noqa: F401
from medseg_tpu.models.r2u_net import R2UNet  # noqa: F401
from medseg_tpu.models.clip import CLIPClassifier  # noqa: F401
from medseg_tpu.models.clipseg import CLIPSegModel  # noqa: F401
