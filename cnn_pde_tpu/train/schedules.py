"""LR schedules with exact PyTorch stepping semantics.

The reference steps CosineAnnealingLR once per *epoch* (mnist_test.py:316) and
OneCycleLR once per *batch* (SVHN.py:340, tiny_imagenet.py:576).  Schedules
here are functions of the global step; per-epoch schedules floor-divide by
steps_per_epoch so one jit'd train step serves both conventions.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cosine_annealing", "onecycle", "constant"]


def constant(lr):
    return lambda step: jnp.asarray(lr, jnp.float32)


def cosine_annealing(base_lr, t_max, steps_per_epoch, eta_min=0.0):
    """torch.optim.lr_scheduler.CosineAnnealingLR stepped per epoch:
    lr(e) = eta_min + (base−eta_min)·(1+cos(π·e/T_max))/2."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / t_max)
        )

    return schedule


def onecycle(max_lr, total_steps, pct_start=0.3, div_factor=25.0,
             final_div_factor=1e4):
    """torch OneCycleLR with cosine annealing (per-batch stepping):
    warmup initial→max over pct_start, then anneal max→initial/final_div."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up_steps = float(pct_start * total_steps) - 1.0  # torch uses float here
    down_steps = float(total_steps - 1) - up_steps

    def _cos(a, b, pct):
        return b + (a - b) * 0.5 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(step):
        step = jnp.minimum(step, total_steps - 1).astype(jnp.float32)
        up_pct = jnp.clip(step / jnp.maximum(up_steps, 1.0), 0.0, 1.0)
        down_pct = jnp.clip((step - up_steps) / jnp.maximum(down_steps, 1.0),
                            0.0, 1.0)
        return jnp.where(step <= up_steps,
                         _cos(initial, max_lr, up_pct),
                         _cos(max_lr, final, down_pct))

    return schedule
