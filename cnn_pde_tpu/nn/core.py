"""Minimal functional module system.

Design stance (SURVEY.md §7): a dependency-light, hand-rolled init/apply layer
gives exact control over PyTorch-parity semantics (BatchNorm momentum/eps and
biased-vs-unbiased variance, dropout scaling, kaiming init variants) without
fighting a framework's conventions.  Modules are plain Python objects holding
hyperparameters and children; parameters/state live in pytrees of jnp arrays:

    module = Linear(784, 256)
    params, state = module.init(key)
    y, new_state = module.apply(params, state, x, ctx)

``state`` carries BatchNorm running statistics (updated only when
``ctx.train``).  ``ctx`` threads the train flag and a PRNG stream for dropout;
rng derivation is deterministic in call order (fold_in with a per-trace
counter), so a given (key, model, batch) triple is reproducible.
"""

from __future__ import annotations

from typing import Any

import jax

Params = Any
State = Any

__all__ = ["Ctx", "Module", "Sequential", "param_path_items", "tree_size"]


class Ctx:
    """Per-call context: train flag + deterministic rng stream.

    The counter is Python-level and resets per trace, so rng use is
    deterministic in module call order (the jit'd step function re-derives the
    same folds every trace).

    ``bn_stats=True`` puts ONLY the normalization layers in their
    batch-statistics mode (compute batch stats, update running stats) while
    everything stochastic (dropout) stays in eval behavior — the precise-BN
    refresh pass (Trainer.refresh_bn_stats): recompute running statistics
    under frozen final params so eval-mode activations match what the
    network actually produces.  ``train=True`` implies both.
    """

    def __init__(self, train: bool = False, rng=None, bn_stats: bool = False):
        self.train = train
        self.bn_stats = bool(train or bn_stats)
        self._rng = rng
        self._count = 0

    def rng(self):
        if self._rng is None:
            raise ValueError("Ctx has no rng but a stochastic layer asked for one "
                             "(pass rng= to Ctx for train-mode dropout).")
        self._count += 1
        return jax.random.fold_in(self._rng, self._count)


class Module:
    """Base class. Subclasses implement init(key) -> (params, state) and
    apply(params, state, x, ctx) -> (y, new_state)."""

    def init(self, key):
        raise NotImplementedError

    def apply(self, params, state, x, ctx: Ctx):
        raise NotImplementedError

    # convenience for stateless forward in tests / inference
    def __call__(self, params, state, x, *, train=False, rng=None,
                 bn_stats=False):
        return self.apply(params, state, x,
                          Ctx(train=train, rng=rng, bn_stats=bn_stats))


class Sequential(Module):
    """Compose children; params/state are dicts keyed by child index (as str),
    giving stable, greppable pytree paths for param-group selection."""

    def __init__(self, layers):
        self.layers = list(layers)

    def init(self, key):
        params, state = {}, {}
        keys = jax.random.split(key, max(len(self.layers), 1))
        for i, (layer, k) in enumerate(zip(self.layers, keys)):
            p, s = layer.init(k)
            params[str(i)] = p
            state[str(i)] = s
        return params, state

    def apply(self, params, state, x, ctx):
        new_state = {}
        for i, layer in enumerate(self.layers):
            x, new_state[str(i)] = layer.apply(params[str(i)], state[str(i)], x, ctx)
        return x, new_state


def param_path_items(params):
    """Yield ('dotted.path', leaf) pairs — the analogue of
    torch.nn.Module.named_parameters() used for param-group selection
    (cifar10.py:425-429, cifar_2version.py:491-494)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = ".".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        yield name, leaf


def tree_size(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
