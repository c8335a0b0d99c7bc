from rtdm_tpu.train.losses import (
    cross_entropy,
    focal_loss,
    label_smoothing_cross_entropy,
    make_classification_loss,
)
from rtdm_tpu.train.trainer import TrainState, Trainer, create_train_state

__all__ = [
    "cross_entropy",
    "focal_loss",
    "label_smoothing_cross_entropy",
    "make_classification_loss",
    "TrainState",
    "Trainer",
    "create_train_state",
]
