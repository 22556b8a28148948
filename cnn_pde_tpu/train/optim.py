"""Optimizer construction: AdamW with named param groups + global-norm clip.

The reference uses torch.optim.AdamW throughout, twice with two param groups
selected by parameter-name substring match:
  * cifar10.py:423-434   — α/β params at (lr, wd 1e-6), rest at (lr·0.5, wd 1e-4)
  * cifar_2version.py:487-499 — diffusion params (α/β/channel_mixing/
    combination_weights) at (lr, wd 1e-6), rest at (lr·0.8, wd 1e-4)
Gradients are clipped to global norm 1.0 *before* the step in every script
(mnist_test.py:305 etc.) — the optax chain below reproduces clip→adamw order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import optax

__all__ = ["ParamGroup", "build_optimizer"]


@dataclass
class ParamGroup:
    """A param group selected by substring match on the dotted param path
    (mirrors the reference's ``'alpha' in name`` selection)."""

    match_substrings: Sequence[str]
    lr_scale: float = 1.0
    weight_decay: float = 1e-4


def _group_labels(params, groups: Sequence[ParamGroup]):
    """Label each leaf with the index of the first matching group (or 'default')."""

    def label_of(name):
        for gi, g in enumerate(groups):
            if any(s in name for s in g.match_substrings):
                return str(gi)
        return "default"

    def path_label(path, _leaf):
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return label_of(name)

    return jax.tree_util.tree_map_with_path(path_label, params)


def build_optimizer(params, schedule: Callable, *,
                    groups: Sequence[ParamGroup] = (),
                    default_weight_decay: float = 1e-4,
                    default_lr_scale: float = 1.0,
                    clip_norm: Optional[float] = 1.0,
                    b1=0.9, b2=0.999, eps=1e-8):
    """AdamW(lr=schedule·group_scale, decoupled wd) with optional global clip.

    Returns an optax.GradientTransformation.
    """

    def adamw(lr_scale, wd):
        return optax.adamw(
            learning_rate=lambda step: schedule(step) * lr_scale,
            b1=b1, b2=b2, eps=eps, weight_decay=wd,
        )

    if groups:
        transforms = {str(gi): adamw(g.lr_scale, g.weight_decay)
                      for gi, g in enumerate(groups)}
        transforms["default"] = adamw(default_lr_scale, default_weight_decay)
        labels = _group_labels(params, groups)
        opt = optax.multi_transform(transforms, labels)
    else:
        opt = adamw(1.0, default_weight_decay)

    if clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt
