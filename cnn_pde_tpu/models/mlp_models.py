"""The four PDE→MLP classifiers (M1, M2, M3, M12) — one module each, matching
the reference assemblies layer-for-layer (SURVEY.md §2.3)."""

from __future__ import annotations

import jax

from ..nn import (
    BatchNorm,
    Ctx,
    Dropout,
    Flatten,
    Linear,
    Module,
    ReLU,
    Sequential,
)
from ..pde import ChannelCoupledDiffusion, FourierFTCSLayer, GrayscaleDiffusion

__all__ = [
    "MNISTClassifier",
    "FashionClassifier",
    "SVHNClassifier",
    "EmotionClassifier",
]


class _PDEThenHead(Module):
    """Shared scaffolding: PDE front-end + classifier head."""

    def __init__(self, pde, head):
        self.pde = pde
        self.head = head

    def init(self, key):
        k1, k2 = jax.random.split(key)
        pp, sp = self.pde.init(k1)
        ph, sh = self.head.init(k2)
        return {"diff": pp, "head": ph}, {"diff": sp, "head": sh}

    def apply(self, params, state, x, ctx):
        x, sd = self.pde.apply(params["diff"], state["diff"], x, ctx)
        y, sh = self.head.apply(params["head"], state["head"], x, ctx)
        return y, {"diff": sd, "head": sh}


class MNISTClassifier(_PDEThenHead):
    """M1 (mnist_test.py:223-237): diff → flatten 784 → dropout(0.1) →
    fc 256 ReLU → dropout → fc 10."""

    def __init__(self, dropout_rate=0.1, dx=1.0, dy=1.0):
        super().__init__(
            GrayscaleDiffusion(size=28, dt=0.001, dx=dx, dy=dy, num_steps=10,
                               init_value=2.0),
            Sequential([
                Flatten(), Dropout(dropout_rate),
                Linear(28 * 28, 256), ReLU(), Dropout(dropout_rate),
                Linear(256, 10),
            ]),
        )


class FashionClassifier(_PDEThenHead):
    """M2 (fashion_mnist.py:200-224): diff → 784 → [512 BN ReLU do(0.15)] →
    [256 BN ReLU do] → 10.  The fashion PDE reuses dx for the y-sweep
    (fashion_mnist.py:63) — dy=dx here."""

    def __init__(self, dropout_rate=0.15):
        super().__init__(
            GrayscaleDiffusion(size=28, dt=0.3, dx=1.0, dy=1.0, num_steps=4,
                               init_value=1.8),
            Sequential([
                Flatten(),
                Linear(28 * 28, 512), BatchNorm(512), ReLU(), Dropout(dropout_rate),
                Linear(512, 256), BatchNorm(256), ReLU(), Dropout(dropout_rate),
                Linear(256, 10),
            ]),
        )


class SVHNClassifier(_PDEThenHead):
    """M3 (SVHN.py:234-270): diff → 3072 → [2048,1024,512,256] each
    BN+ReLU+dropout(0.5) → 10."""

    def __init__(self, dropout_rate=0.5):
        layers = [Flatten()]
        prev = 32 * 32 * 3
        for h in (2048, 1024, 512, 256):
            layers += [Linear(prev, h), BatchNorm(h), ReLU(), Dropout(dropout_rate)]
            prev = h
        layers.append(Linear(prev, 10))
        super().__init__(
            ChannelCoupledDiffusion(size=32, channels=3, dt=0.01, num_steps=10),
            Sequential(layers),
        )


class EmotionClassifier(_PDEThenHead):
    """M12 (emotion_recognition.py:170-195): FTCS PDE → 2304 → [512,256,128]
    BN+ReLU+do(0.3) → 7."""

    def __init__(self, img_size=48, num_classes=7, dropout_rate=0.3):
        layers = [Flatten()]
        prev = img_size * img_size
        for h in (512, 256, 128):
            layers += [Linear(prev, h), BatchNorm(h), ReLU(), Dropout(dropout_rate)]
            prev = h
        layers.append(Linear(prev, num_classes))
        super().__init__(
            FourierFTCSLayer(Nx=img_size, Ny=img_size),
            Sequential(layers),
        )
