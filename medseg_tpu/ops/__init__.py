from medseg_tpu.ops.image import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    letterbox_params,
    warp_affine,
    normalize_imagenet,
)
from medseg_tpu.ops.augment import (  # noqa: F401
    sample_augment_params,
    augment_batch,
    preprocess_eval_batch,
)
