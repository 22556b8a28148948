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
import jax.numpy as jnp
import optax

__all__ = ["ParamGroup", "build_optimizer", "scale_by_adam_low_precision"]


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


def scale_by_adam_low_precision(b1=0.9, b2=0.999, eps=1e-8,
                                dtype=None):
    """optax.scale_by_adam with BOTH moments stored in ``dtype`` (f32
    compute, low-precision state).

    The grouped-AdamW update is a pure streaming pass (PERF.md §tiny: ~10
    memory passes over every param); m and v are 8 of the ~28 bytes/param
    streamed, so bf16 moments cut real step time on the big-param presets
    (measured −7% tiny_imagenet, −19% hybrid full step —
    tools/ab_opt_bf16.py).  bf16 keeps f32's exponent RANGE (v ~ g² stays
    representable); the 8-bit mantissa adds ~0.4% relative noise to the
    moment estimates, halved through nu's sqrt — the usual low-precision-
    Adam grade.  NOT reference semantics (torch AMP keeps f32 optimizer
    states), so this is opt-in (--bf16-moments), never a default."""

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params))

    def update(updates, state, params=None):
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(f32) + (1 - b1) * g,
            state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(f32) + (1 - b2) * g * g,
            state.nu, updates)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(dtype), t)
        return out, optax.ScaleByAdamState(count=count, mu=cast(mu),
                                           nu=cast(nu))

    return optax.GradientTransformation(init, update)


def build_optimizer(params, schedule: Callable, *,
                    groups: Sequence[ParamGroup] = (),
                    default_weight_decay: float = 1e-4,
                    default_lr_scale: float = 1.0,
                    clip_norm: Optional[float] = 1.0,
                    b1=0.9, b2=0.999, eps=1e-8,
                    moment_dtype=None):
    """AdamW(lr=schedule·group_scale, decoupled wd) with optional global clip.

    ``moment_dtype``: storage dtype for Adam's m AND v (None = f32, the
    reference/torch semantics).  ``jnp.bfloat16`` halves the optimizer's
    moment streaming traffic — see scale_by_adam_low_precision.

    Returns an optax.GradientTransformation.
    """

    def adamw(lr_scale, wd):
        if moment_dtype is None:
            return optax.adamw(
                learning_rate=lambda step: schedule(step) * lr_scale,
                b1=b1, b2=b2, eps=eps, weight_decay=wd,
            )
        # optax.adamw == scale_by_adam -> add_decayed_weights -> lr; the
        # same chain with low-precision moment state
        return optax.chain(
            scale_by_adam_low_precision(b1=b1, b2=b2, eps=eps,
                                        dtype=moment_dtype),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(
                lambda step: schedule(step) * lr_scale),
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
