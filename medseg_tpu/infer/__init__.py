from medseg_tpu.infer.overlay import red_overlay, resize_mask_nearest  # noqa: F401
from medseg_tpu.infer.pipeline import Pipeline  # noqa: F401
