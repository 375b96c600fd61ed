"""Training subsystem: optimizer/schedule, jitted steps, meters,
checkpointing, and the epoch loop."""

from .schedule import warmup_exponential_schedule, make_optimizer
from .state import TrainState, create_train_state
from .steps import make_train_step, make_eval_step, cross_entropy_loss
from .metrics import AverageMeter, ProgressMeter, accuracy_topk

__all__ = [
    "warmup_exponential_schedule",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "cross_entropy_loss",
    "AverageMeter",
    "ProgressMeter",
    "accuracy_topk",
]
