"""Functional NN building blocks with PyTorch-parity semantics."""

from .core import Ctx, Module, Sequential, param_path_items, tree_size
from .layers import (
    AdaptiveAvgPool2d,
    AdaptiveMaxPool2d,
    BatchNorm,
    Conv2d,
    Dropout,
    Flatten,
    Identity,
    Lambda,
    Linear,
    MaxPool2d,
    ReLU,
    Sigmoid,
    Tanh,
)

__all__ = [
    "Ctx",
    "Module",
    "Sequential",
    "param_path_items",
    "tree_size",
    "AdaptiveAvgPool2d",
    "AdaptiveMaxPool2d",
    "BatchNorm",
    "Conv2d",
    "Dropout",
    "Flatten",
    "Identity",
    "Lambda",
    "Linear",
    "MaxPool2d",
    "ReLU",
    "Sigmoid",
    "Tanh",
]
