"""One-switch AMP for PDE models — the TPU analogue of the reference's
``torch.cuda.amp.autocast`` training (cifar10.py:440, cifar_2version.py:503).

The reference runs its whole forward under autocast; here the half-precision
surface is chosen deliberately: the ADI solve operators (the step's dominant
cost) are stored and applied in bf16 with f32 accumulation, while the bands,
boundary handling and everything outside the solves stay f32.

``enable_amp(model)`` flips BOTH bf16 mechanisms:

* the per-layer **hoisted-bf16** path on every ADI diffusion layer reachable
  from ``model`` (``hoisted=True, operator_dtype=bf16``): all sweep inverses
  for an evolution are precomputed in one batched PCR call (rows independent
  of batch size), and each sweep becomes ONE bf16 MXU matmul with the
  analytic custom-VJP adjoint reusing the same operator
  (ops/tridiag.py::tridiag_solve_precomputed).  Measured fastest on the
  flagship step: 1.76 ms vs 1.95 (per-sweep matinv_bf16) vs 2.26 (f32 pcr),
  PERF.md §hoisted-direct.
* the global **matinv_bf16** default impl, so any tridiagonal solve OUTSIDE
  the hoisted layers (e.g. ``ResidualDiffusion(use_implicit=True)``) runs
  bf16 explicit-inverse too.
* every **Conv2d / SymmetricLayer** reachable from ``model`` gets
  ``compute_dtype=bf16`` (operands cast, f32 master params) — the
  weight-traffic-bound dense ops.  The reference's autocast region covers
  nn.Linear too (cifar10.py:459-461, cifar_2version.py:520), but explicit
  bf16 on plain Linears is a measured LOSS here: XLA's DEFAULT matmul
  precision already runs f32 operands as MXU passes, so the cast only adds
  an extra elementwise pass over activations (A/B on the svhn head −3%,
  tiny_imagenet −5% vs conv-only; tools/ab_dense_amp.py).  Conv operands
  are where the traffic halves: tiny_imagenet's ResNet backbone is +7%
  (1.80 → 1.68 ms/step).  ``Linear(compute_dtype=...)`` remains available
  as a per-layer opt-in.  BatchNorm statistics, biases, softmax/sigmoid
  gates and all PDE band construction stay f32 (matching autocast's own
  f32 list).  Pass ``dense=False`` for the solver-only AMP surface.

Numerics: the hoisted-bf16 apply computes the SAME bf16 inverse (same PCR,
same rounding) and the SAME single-matmul application as the per-sweep
matinv_bf16 impl — only hoisted out of the step loop — so the all-preset
accuracy validation for matinv_bf16 (PERF.md §all-presets: AMP final
accuracy within seed spread of f32 on every preset) carries over.  Not on
the exact-parity surface (~4e-3 relative vs the f32 solve).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..nn.core import Module
from ..nn.layers import Conv2d
from ..ops.tridiag import set_default_impl
from .diffusion import (
    ChannelCoupledDiffusion,
    GrayscaleDiffusion,
    MixedChannelDiffusion,
)
from .ruthotto import SymmetricLayer

__all__ = ["enable_amp", "iter_adi_layers", "iter_modules"]

_ADI_CLASSES = (GrayscaleDiffusion, ChannelCoupledDiffusion,
                MixedChannelDiffusion)


def iter_modules(module, classes):
    """Yield every instance of ``classes`` reachable from ``module`` by
    walking module attributes and plain list/tuple/dict containers."""
    seen = set()
    stack = [module]
    while stack:
        obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        if isinstance(obj, classes):
            yield obj
        if isinstance(obj, Module):
            stack.extend(vars(obj).values())
        elif isinstance(obj, (list, tuple)):
            stack.extend(obj)
        elif isinstance(obj, dict):
            stack.extend(obj.values())


def iter_adi_layers(module):
    """Yield every ADI diffusion layer reachable from ``module``."""
    return iter_modules(module, _ADI_CLASSES)


def enable_amp(model=None, dense=True):
    """Switch ``model`` (and the global solver default) to the bf16 AMP
    configuration.  Mutates layer hyperparameters — call BEFORE tracing/jit.
    ``dense=True`` (default) also casts every Conv2d/SymmetricLayer to bf16
    operands — the weight-traffic-bound part of autocast's coverage (see
    module docstring for why plain Linears are excluded);
    ``dense=False`` keeps only the ADI-solver AMP surface.
    Returns the number of ADI layers switched to the hoisted-bf16 path."""
    set_default_impl("matinv_bf16")
    n = 0
    if model is not None:
        for lay in iter_adi_layers(model):
            lay.hoisted = True
            lay.operator_dtype = jnp.bfloat16
            lay.hoisted_refine = False
            n += 1
        if dense:
            for lay in iter_modules(model, (Conv2d, SymmetricLayer)):
                lay.compute_dtype = jnp.bfloat16
    return n
