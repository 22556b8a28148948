"""L2 PDE evolution layers (the reference's DiffusionLayer family, rebuilt)."""

from .amp import enable_amp, iter_adi_layers
from .diffusion import (
    ChannelCoupledDiffusion,
    GrayscaleDiffusion,
    MixedChannelDiffusion,
)
from .residual import ResidualDiffusion
from .ruthotto import HamiltonianBlock, ParabolicBlock, SymmetricLayer
from .spectral import FourierFTCSLayer

__all__ = [
    "enable_amp",
    "iter_adi_layers",
    "ChannelCoupledDiffusion",
    "GrayscaleDiffusion",
    "MixedChannelDiffusion",
    "ResidualDiffusion",
    "HamiltonianBlock",
    "ParabolicBlock",
    "SymmetricLayer",
    "FourierFTCSLayer",
]
