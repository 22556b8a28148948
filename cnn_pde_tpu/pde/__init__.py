"""L2 PDE evolution layers (the reference's DiffusionLayer family, rebuilt)."""

from .diffusion import (
    ChannelCoupledDiffusion,
    GrayscaleDiffusion,
    MixedChannelDiffusion,
)
from .residual import ResidualDiffusion
from .ruthotto import HamiltonianBlock, ParabolicBlock, SymmetricLayer
from .spectral import FourierFTCSLayer

__all__ = [
    "ChannelCoupledDiffusion",
    "GrayscaleDiffusion",
    "MixedChannelDiffusion",
    "ResidualDiffusion",
    "HamiltonianBlock",
    "ParabolicBlock",
    "SymmetricLayer",
    "FourierFTCSLayer",
]
