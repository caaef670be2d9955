from masters_thesis_tpu.train.losses import (
    accuracy,
    attention_loss,
    caption_loss,
    l2_loss,
    lc_nic_l2_rules,
)
from masters_thesis_tpu.train.optim import make_optimizer
from masters_thesis_tpu.train.state import TrainState
from masters_thesis_tpu.train.steps import make_eval_step, make_train_step

__all__ = [
    "accuracy",
    "attention_loss",
    "caption_loss",
    "l2_loss",
    "lc_nic_l2_rules",
    "make_optimizer",
    "TrainState",
    "make_eval_step",
    "make_train_step",
]
