from image_matching_tpu.train.state import TrainState, create_train_state
from image_matching_tpu.train.superpoint_trainer import (
    SuperPointLossConfig,
    make_superpoint_train_step,
)
from image_matching_tpu.train.superglue_trainer import make_superglue_train_step

__all__ = [
    "TrainState",
    "create_train_state",
    "SuperPointLossConfig",
    "make_superpoint_train_step",
    "make_superglue_train_step",
]
