"""Models: masking tasks, encoder/decoder, transformer blocks, objectives."""

from . import losses, masking, sorting
from .decoder import Decoder
from .encoder import Encoder
from .losses import compute_mfp_loss
from .mfp import (
    MFPModel,
    TaskConfig,
    forward_eval,
    forward_train,
    iterative_decode,
    make_task_config,
)
from .transformer import Blocks, DeepSVGBlock, MultiHeadAttention, TransformerBlock

__all__ = [
    "Blocks",
    "Decoder",
    "DeepSVGBlock",
    "Encoder",
    "MFPModel",
    "MultiHeadAttention",
    "TaskConfig",
    "TransformerBlock",
    "compute_mfp_loss",
    "forward_eval",
    "forward_train",
    "iterative_decode",
    "losses",
    "make_task_config",
    "masking",
    "sorting",
]
