from medseg_tpu.train.losses import (  # noqa: F401
    batch_iou,
    bce_with_logits,
    combined_loss,
    cross_entropy,
    dice_loss,
)
from medseg_tpu.train.schedules import (  # noqa: F401
    EarlyStopping,
    ReduceLROnPlateau,
    cosine_annealing,
)
from medseg_tpu.train.freeze import (  # noqa: F401
    all_trainable,
    finetune_filter,
    head_only,
    mask_from_predicate,
)
from medseg_tpu.train import steps  # noqa: F401
from medseg_tpu.train import checkpoint  # noqa: F401
from medseg_tpu.train.trainer import (  # noqa: F401
    TrainResult,
    train_model,
    train_model_resilient,
)
from medseg_tpu.train.clip_finetune import finetune_clip  # noqa: F401
from medseg_tpu.train.clipseg_finetune import finetune_clipseg  # noqa: F401
