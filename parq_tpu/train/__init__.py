from .schedule import cosine_warmup_restarts, build_lr_schedule
from .train_step import (TrainState, LossConfig, make_optimizer,
                         create_train_state, train_step, eval_step,
                         make_jitted_train_step, make_jitted_eval_step,
                         forward_and_loss)
from .checkpoint import (make_manager, save_state, restore_state,
                         load_pretrained)

__all__ = [
    "cosine_warmup_restarts", "build_lr_schedule", "TrainState", "LossConfig",
    "make_optimizer", "create_train_state", "train_step", "eval_step",
    "make_jitted_train_step", "make_jitted_eval_step", "forward_and_loss",
    "make_manager", "save_state", "restore_state", "load_pretrained",
]
