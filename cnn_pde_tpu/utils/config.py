"""Experiment presets — one dataclass config per reference script, replacing
their hardcoded hyperparameter blocks (SURVEY.md §2.5, §6).

Each preset pins: model constructor, dataset name, optimizer/schedule settings,
augmentation spec and train-loop behaviors (eval cadence, early stopping,
regularizer) with file:line provenance."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from ..data.augment import AugmentSpec
from ..data.real import NORMALIZATION
from ..train.loop import TrainConfig
from ..train.losses import hybrid_pde_regularization
from ..train.optim import ParamGroup
from ..train import schedules

__all__ = ["Preset", "PRESETS", "get_preset"]


@dataclass
class Preset:
    name: str
    model: str                   # key into models.MODEL_REGISTRY
    dataset: str                 # key into data.load_dataset
    epochs: int
    batch_size: int
    lr: float
    weight_decay: float
    schedule: str                # 'cosine' | 'onecycle'
    schedule_kwargs: dict = field(default_factory=dict)
    label_smoothing: float = 0.1
    clip_norm: Optional[float] = 1.0   # global-norm clip; None = no clipping
    default_lr_scale: float = 1.0
    param_groups: Sequence[ParamGroup] = ()
    regularizer: Optional[Callable] = None
    eval_every: int = 1
    early_stop_patience: Optional[int] = None
    augment: AugmentSpec = field(default_factory=AugmentSpec)
    model_kwargs: dict = field(default_factory=dict)
    num_classes: int = 10

    def make_schedule(self, steps_per_epoch: int):
        if self.schedule == "cosine":
            t_max = self.schedule_kwargs.get("t_max", self.epochs)
            eta_min = self.schedule_kwargs.get("eta_min", 0.0)
            return schedules.cosine_annealing(self.lr, t_max, steps_per_epoch,
                                              eta_min)
        if self.schedule == "onecycle":
            return schedules.onecycle(
                self.schedule_kwargs.get("max_lr", self.lr),
                total_steps=self.epochs * steps_per_epoch,
                pct_start=self.schedule_kwargs.get("pct_start", 0.3),
            )
        return schedules.constant(self.lr)

    def make_train_config(self, **overrides) -> TrainConfig:
        kw = dict(
            epochs=self.epochs,
            batch_size=self.batch_size,
            label_smoothing=self.label_smoothing,
            clip_norm=self.clip_norm,
            weight_decay=self.weight_decay,
            default_lr_scale=self.default_lr_scale,
            param_groups=self.param_groups,
            regularizer=self.regularizer,
            eval_every=self.eval_every,
            early_stop_patience=self.early_stop_patience,
        )
        kw.update(overrides)
        return TrainConfig(**kw)


def _norm(name):
    mean, std = NORMALIZATION[name]
    return dict(mean=mean, std=std)


PRESETS = {
    # mnist_test.py:263-345 — 1 epoch, bs 128, AdamW 1e-3/1e-4, cosine T_max=3
    "mnist": Preset(
        name="mnist", model="mnist", dataset="mnist",
        epochs=1, batch_size=128, lr=1e-3, weight_decay=1e-4,
        schedule="cosine", schedule_kwargs={"t_max": 3},
        augment=AugmentSpec(rotation=5.0, translate=0.05),
    ),
    # fashion_mnist.py:256-331 — 25 epochs, bs 128, AdamW 2e-3/5e-4, cosine T=5
    "fashion_mnist": Preset(
        name="fashion_mnist", model="fashion_mnist", dataset="fashion_mnist",
        epochs=25, batch_size=128, lr=2e-3, weight_decay=5e-4,
        schedule="cosine", schedule_kwargs={"t_max": 5},
        augment=AugmentSpec(rotation=10.0, translate=0.1, hflip=0.5,
                            **_norm("fashion_mnist")),
    ),
    # SVHN.py:300-406 — 15 epochs, bs 256, OneCycleLR(max 1e-2) per batch,
    # CE without smoothing, eval every 2 epochs
    "svhn": Preset(
        name="svhn", model="svhn", dataset="svhn",
        epochs=15, batch_size=256, lr=1e-2, weight_decay=1e-4,
        schedule="onecycle", schedule_kwargs={"max_lr": 1e-2},
        label_smoothing=0.0, eval_every=2,
        augment=AugmentSpec(**_norm("svhn")),
    ),
    # cifar10.py:400-527 — 20 epochs, bs 64, two-group AdamW (α/β at lr wd 1e-6,
    # rest lr·0.5 wd 1e-4), cosine T=epochs
    "cifar10_noconv": Preset(
        name="cifar10_noconv", model="cifar10_noconv", dataset="cifar10",
        epochs=20, batch_size=64, lr=1e-3, weight_decay=1e-4,
        schedule="cosine", default_lr_scale=0.5,
        param_groups=(ParamGroup(("alpha", "beta"), lr_scale=1.0,
                                 weight_decay=1e-6),),
        augment=AugmentSpec(crop_padding=4, hflip=0.5, rotation=10.0,
                            brightness=0.2, contrast=0.2, saturation=0.2,
                            hue=0.1, erasing_p=0.1, **_norm("cifar10")),
    ),
    # cifar_2version.py:470-595 — 25 epochs, bs 64, groups incl channel_mixing/
    # combination_weights, rest lr·0.8; hybrid regularizer (2e-4, 1e-4, 1e-6)
    "cifar10_hybrid": Preset(
        name="cifar10_hybrid", model="cifar10_hybrid", dataset="cifar10",
        epochs=25, batch_size=64, lr=1e-3, weight_decay=1e-4,
        schedule="cosine", default_lr_scale=0.8,
        param_groups=(ParamGroup(("alpha", "beta", "channel_mixing",
                                  "combination_weights"), lr_scale=1.0,
                                 weight_decay=1e-6),),
        regularizer=lambda p: hybrid_pde_regularization(p, 2e-4, 1e-4, 1e-6),
        augment=AugmentSpec(crop_padding=4, hflip=0.5, rotation=10.0,
                            brightness=0.2, contrast=0.2, saturation=0.2,
                            hue=0.1, erasing_p=0.1, **_norm("cifar10")),
    ),
    # emotion_recognition.py:265-369 — ≤70 epochs, bs 64, AdamW 1e-3/1e-4,
    # cosine T=70 eta_min 1e-6, eval every 5, early stop patience 10 (per
    # eval); its train_epoch (:198-227) is the ONE loop with no grad clip
    "emotion": Preset(
        name="emotion", model="emotion", dataset="emotion",
        epochs=70, batch_size=64, lr=1e-3, weight_decay=1e-4,
        schedule="cosine", schedule_kwargs={"t_max": 70, "eta_min": 1e-6},
        label_smoothing=0.0, clip_norm=None, eval_every=5,
        early_stop_patience=10,
        num_classes=7,
        augment=AugmentSpec(hflip=0.5, rotation=10.0),
    ),
    # tiny_imagenet.py:517-621 — 10 epochs, bs 32, OneCycleLR(max 0.01,
    # pct_start 0.1) per batch
    "tiny_imagenet": Preset(
        name="tiny_imagenet", model="tiny_imagenet", dataset="tiny_imagenet",
        epochs=10, batch_size=32, lr=1e-3, weight_decay=1e-4,
        schedule="onecycle", schedule_kwargs={"max_lr": 1e-2, "pct_start": 0.1},
        num_classes=200, model_kwargs={"num_classes": 200},
        # Resize(72)+RandomCrop(64) (tiny_imagenet.py:524-525) via resize_crop
        augment=AugmentSpec(resize_crop=72, hflip=0.5, brightness=0.1,
                            contrast=0.1, saturation=0.1, hue=0.05,
                            **_norm("tiny_imagenet")),
    ),
}


def get_preset(name: str) -> Preset:
    return PRESETS[name]
