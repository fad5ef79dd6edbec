from vqa_project_tpu.train.state import (
    TrainState,
    create_train_state,
    make_lr_schedule,
    save_checkpoint,
    load_checkpoint,
)
from vqa_project_tpu.train.steps import build_train_step, build_eval_step

__all__ = [
    "TrainState",
    "create_train_state",
    "make_lr_schedule",
    "save_checkpoint",
    "load_checkpoint",
    "build_train_step",
    "build_eval_step",
]
