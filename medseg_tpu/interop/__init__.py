from medseg_tpu.interop.common import ConversionError, StateDict, verify_tree_shapes  # noqa: F401
from medseg_tpu.interop.torch_cnn import (  # noqa: F401
    convert_attention_unet,
    convert_r2u_net,
    convert_resnet_classifier,
    convert_resnet_unet,
    convert_vgg_classifier,
)
from medseg_tpu.interop.hf_clip import (  # noqa: F401
    convert_clip,
    convert_clip_classifier,
    convert_clipseg,
)
from medseg_tpu.interop.text_features import (  # noqa: F401
    clip_bundle_from_torch_sd,
    clip_text_features,
    clipseg_bundle_from_torch_sd,
    clipseg_cond,
)
from medseg_tpu.interop.export_torch import (  # noqa: F401
    export_attention_unet,
    export_r2u_net,
    export_resnet_classifier,
    export_resnet_unet,
    export_vgg_classifier,
    save_torch_checkpoint,
)
