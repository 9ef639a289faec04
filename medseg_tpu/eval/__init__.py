from medseg_tpu.eval.metrics import (  # noqa: F401
    classification_metrics,
    confusion_matrix,
    segmentation_metrics_batched,
    segmentation_metrics_single,
    average_segmentation_metrics,
)
