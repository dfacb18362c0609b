"""Trainer, optimizer, and checkpointing."""

from .checkpoint import load_checkpoint, save_checkpoint
from .optim import clip_by_per_leaf_norm, l2_penalty, make_optimizer
from .trainer import (
    TrainConfig,
    TrainState,
    build_model,
    evaluate_split,
    init_params,
    make_train_step,
    make_val_step,
    train,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "build_model",
    "clip_by_per_leaf_norm",
    "evaluate_split",
    "init_params",
    "l2_penalty",
    "load_checkpoint",
    "make_optimizer",
    "make_train_step",
    "make_val_step",
    "save_checkpoint",
    "train",
]
