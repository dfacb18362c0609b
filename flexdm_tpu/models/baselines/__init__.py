"""Baseline model families (reference extras; unreachable in the reference
trainer due to the ``arch_type == 'oneshot'`` assert at mfp.py:230, but part
of the published code surface — working versions here)."""

from .autoreg import BART, AutoReg, CrossBlock, CrossBlocks
from .canvasvae import CanvasVAE
from .cvae import (
    Head,
    MACVAEDecoder,
    MACVAEEncoder,
    MAPrior,
    Prior,
    VAEDecoder,
    VAEEncoder,
    gaussian_kl,
)
from .layoutvae import LayoutVAE

__all__ = [
    "AutoReg",
    "BART",
    "CanvasVAE",
    "CrossBlock",
    "CrossBlocks",
    "Head",
    "LayoutVAE",
    "MACVAEDecoder",
    "MACVAEEncoder",
    "MAPrior",
    "Prior",
    "VAEDecoder",
    "VAEEncoder",
    "gaussian_kl",
]
