from diffpose_tpu.train.optim import make_optimizer, staircase_lr
from diffpose_tpu.train.state import TrainState
from diffpose_tpu.train.steps import (
    make_train_step,
    make_eval_step,
    diffusion_loss,
)
from diffpose_tpu.train.checkpoint import Checkpointer
from diffpose_tpu.train.trainer import DiffposeRunner

__all__ = [
    "make_optimizer",
    "staircase_lr",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "diffusion_loss",
    "Checkpointer",
    "DiffposeRunner",
]
