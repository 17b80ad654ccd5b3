"""Training layer: state, step, schedule, loop, checkpointing."""

from stabnet_tpu.train.state import (
    TrainState,
    create_train_state,
    lr_schedule,
    make_optimizer,
)
from stabnet_tpu.train.train import (
    compute_losses,
    eval_step,
    loss_gates,
    make_eval_step,
    make_train_step,
    train_step,
)

__all__ = [
    "TrainState",
    "compute_losses",
    "create_train_state",
    "eval_step",
    "loss_gates",
    "lr_schedule",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "train_step",
]
