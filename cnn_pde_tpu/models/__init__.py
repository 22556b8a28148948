"""L3 model assemblies — one flagship classifier per reference script."""

from .attention import NonConvSpatialAttention, SpatialAttention
from .cifar10_hybrid import (
    CIFAR10HybridPDEModel,
    HybridClassifierHead,
    HybridPDEExtractor,
)
from .cifar10_noconv import CIFAR10PDENoConv, EnhancedFC, MultiScaleExtractor
from .mlp_models import (
    EmotionClassifier,
    FashionClassifier,
    MNISTClassifier,
    SVHNClassifier,
)
from .tiny_imagenet import BasicBlock, TinyImageNetClassifier

MODEL_REGISTRY = {
    "mnist": MNISTClassifier,
    "fashion_mnist": FashionClassifier,
    "svhn": SVHNClassifier,
    "cifar10_noconv": CIFAR10PDENoConv,
    "cifar10_hybrid": CIFAR10HybridPDEModel,
    "emotion": EmotionClassifier,
    "tiny_imagenet": TinyImageNetClassifier,
}

__all__ = [
    "SpatialAttention",
    "NonConvSpatialAttention",
    "CIFAR10HybridPDEModel",
    "HybridClassifierHead",
    "HybridPDEExtractor",
    "CIFAR10PDENoConv",
    "EnhancedFC",
    "MultiScaleExtractor",
    "EmotionClassifier",
    "FashionClassifier",
    "MNISTClassifier",
    "SVHNClassifier",
    "BasicBlock",
    "TinyImageNetClassifier",
    "MODEL_REGISTRY",
]
