"""Data pipelines: synthetic fixtures, real-format loaders, on-device JAX
augmentation."""

from .augment import AugmentSpec, build_augment_fn, build_normalize_fn
from .pipeline import ArrayDataset
from .real import NORMALIZATION, load_dataset
from .synthetic import (
    SYNTHETIC_SPECS,
    make_synthetic,
    write_synthetic_tiny_imagenet,
)

__all__ = [
    "AugmentSpec",
    "build_augment_fn",
    "build_normalize_fn",
    "ArrayDataset",
    "NORMALIZATION",
    "load_dataset",
    "SYNTHETIC_SPECS",
    "make_synthetic",
    "write_synthetic_tiny_imagenet",
]
