from medseg_tpu.eval.harness import (  # noqa: F401
    evaluate_model,
    load_model_bundle,
    load_torch_weights,
    print_summary,
    test_all_models,
)
from medseg_tpu.eval.csv_io import save_results_to_csv  # noqa: F401
from medseg_tpu.eval.metrics import (  # noqa: F401
    classification_metrics,
    confusion_matrix,
    segmentation_metrics_batched,
    segmentation_metrics_single,
    average_segmentation_metrics,
)
