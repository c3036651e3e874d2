from .optim import build_optimizer, label_params
from .schedules import (
    ema_momentum_schedule,
    loss_weight_factors,
    warmup_multistep_lr,
)
from .scaling import apply_accum_lr_scale, auto_scale_workers
from .trainer import (
    TrainState,
    create_train_state,
    distillation_nms,
    make_train_step,
    prepare_distillation_targets,
)

__all__ = [
    "build_optimizer",
    "label_params",
    "ema_momentum_schedule",
    "loss_weight_factors",
    "warmup_multistep_lr",
    "TrainState",
    "create_train_state",
    "distillation_nms",
    "make_train_step",
    "prepare_distillation_targets",
]
