"""Full-evolution linearization for frozen-params serving.

Every PDE front-end layer in this framework is LINEAR in its input ``u``:
the learnable clamps/sigmoids/smoothing act on COEFFICIENTS (params), never
on activations — the implicit ADI sweeps, channel mixing/coupling, the
sigmoid skip blend (affine in (u0, u)), the frozen-ring FTCS stencil and the
damped conv-Laplacian residual step are all linear maps of the layer input
(reference counterparts: mnist_test.py:44-65, SVHN.py:68-86, cifar10.py:74-114,
emotion_recognition.py:82-97, tiny_imagenet.py:34-51 — none applies a
nonlinearity to u).

So with frozen params the ENTIRE multi-step evolution composes into one dense
(D, D) matrix, D = C·H·W, and serving replaces the 2·steps(+1) sequential
sweep solves per layer with ONE MXU matmul ``u.reshape(B, D) @ M``.  The
matrix is built by evolving the identity basis — a batch of D one-hot images
— through the layer's own forward code (columns of M are L(e_i)), so every
variant quirk (Strang vs Lie order, eps placement, time bookkeeping, skip
blend) is baked in by construction, not re-derived.

This is training-USELESS (params change every step, and rebuilding M costs a
batch-D forward) but serving-optimal; like ``serve.cache_hoisted_operators``
it is an explicit frozen-params mode: training with a pinned ``linear_cache``
raises.

Numerics: M is composed in f32 through the layer's exact forward; applying it
reorders the f32 accumulation of the sequential path, so outputs agree to
~1e-5 relative (f32 reassociation over D-term sums), not bitwise.  On TPU the
(B, D) @ (D, D) matmul runs at DEFAULT precision (bf16-pass MXU) by default —
the same half-precision serving grade as ``enable_amp``; pass
``precision='highest'`` to ``serve.linearize_pde_layers`` for f32-exact
passes.  Not on the exact-parity surface (which stays the sequential f32 PCR
path); CLAUDE.md's HIGHEST-precision invariant governs the parity surface,
and this path is gated behind an explicit serving opt-in.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["capture_linearized", "linearized_apply", "iter_linear_pde_layers",
           "QuantizedMatrix", "quantize_int8"]


class QuantizedMatrix(NamedTuple):
    """int8-quantized evolution matrix: ``M ≈ q * scale[None, :]``.

    ``q`` is (D, D) int8, ``scale`` (D,) f32 per-OUTPUT-column symmetric
    scales (column j's max |entry| / 127).  Serving applies it with int8
    operands and int32 MXU accumulation (2x the bf16 MXU rate, quarter the
    f32 matrix HBM traffic); the input batch is quantized dynamically with
    a per-row scale at apply time.  A NamedTuple so it flows through
    ``make_predict_fn``'s cache pytree (bind='args') unchanged."""

    q: jnp.ndarray
    scale: jnp.ndarray


def quantize_int8(mat):
    """Per-output-column symmetric int8 quantization of a composed (D, D)
    evolution matrix (f32 → QuantizedMatrix)."""
    m = jnp.asarray(mat, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(m), axis=0), 1e-30) / 127.0
    q = jnp.clip(jnp.round(m / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantizedMatrix(q, scale)

_LINEAR_CAPTURE = None


class _Capture:
    def __init__(self, max_dim):
        self.max_dim = max_dim
        self.items = []    # [(layer, traced (D, D) matrix)]
        self.skipped = []  # [(layer, D)] — over max_dim, left sequential


@contextmanager
def capture_linearized(max_dim=4096):
    """Trace-time capture of composed evolution matrices (the analogue of
    ``diffusion.capture_operators``).  While active, every linearizable PDE
    layer with D = C·H·W ≤ max_dim appends ``(layer, M)`` to the yielded
    capture instead of running its sequential evolution on the probe input;
    under jit the matrices are tracers the probe returns to materialize."""
    global _LINEAR_CAPTURE
    prev, cap = _LINEAR_CAPTURE, _Capture(max_dim)
    _LINEAR_CAPTURE = cap
    try:
        yield cap
    finally:
        _LINEAR_CAPTURE = prev


def _apply_mat(u, mat, precision):
    B = u.shape[0]
    if isinstance(mat, QuantizedMatrix):
        # int8 path: dynamic per-row activation quantization (symmetric,
        # row max / 127), int8 x int8 -> int32 MXU matmul, one fused
        # rescale.  Error budget: ~0.4% weight-column + ~0.4% activation-row
        # rounding — the W8A8 serving grade (tests pin prediction agreement
        # and a bounded logits delta).
        x = u.reshape(B, -1)
        r = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-30) / 127.0
        xq = jnp.clip(jnp.round(x / r[:, None]), -127, 127).astype(jnp.int8)
        acc = lax.dot_general(xq, mat.q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * r[:, None] * mat.scale[None, :]
        return out.reshape(u.shape)
    if mat.dtype == jnp.bfloat16:
        # true half-precision path: bf16 operands, f32 accumulation —
        # halves the matrix HBM traffic (the bs=1 serving cost) instead of
        # upcasting the stored matrix back to f32
        out = lax.dot_general(u.reshape(B, -1).astype(jnp.bfloat16), mat,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    else:
        out = lax.dot(u.reshape(B, -1), mat.astype(u.dtype),
                      precision=precision)
    return out.reshape(u.shape)


def linearized_apply(layer, params, state, u, ctx):
    """Layer-entry hook: returns the linearized output, or None to proceed
    with the normal sequential evolution.

    * ``layer.linear_cache`` pinned (serve.linearize_pde_layers): apply the
      composed matrix — one matmul.  Training with a cache pinned raises,
      exactly like ``operator_cache`` (the matrix carries no gradient path
      and goes stale the moment params change).
    * inside ``capture_linearized``: build the matrix by evolving the
      identity basis through the layer's OWN apply (capture suspended for
      the recursion), record it, and return its application to the probe
      input.
    """
    mat = getattr(layer, "linear_cache", None)
    if mat is not None:
        if ctx is not None and ctx.train:
            raise ValueError(
                "linear_cache is pinned on this layer (frozen-params "
                "linearized serving) but apply() was called with "
                "ctx.train=True; serve.clear_linear_cache(model) before "
                "training")
        return _apply_mat(u, mat, getattr(layer, "linear_precision", None))

    global _LINEAR_CAPTURE
    cap = _LINEAR_CAPTURE
    if cap is None or (ctx is not None and ctx.train):
        return None
    D = int(np.prod(u.shape[1:]))
    if D > cap.max_dim:
        cap.skipped.append((layer, D))
        return None
    _LINEAR_CAPTURE = None  # suspend: the basis evolution must run sequential
    try:
        basis = jnp.eye(D, dtype=u.dtype).reshape((D,) + u.shape[1:])
        out_basis, _ = layer.apply(params, state, basis, ctx)
        mat = out_basis.reshape(D, D)  # rows: input basis i; cols: output j
    finally:
        _LINEAR_CAPTURE = cap
    cap.items.append((layer, mat))
    return _apply_mat(u, mat, getattr(layer, "linear_precision", None))


def iter_linear_pde_layers(module):
    """Yield every linearizable PDE layer reachable from ``module``
    (the ADI diffusion variants + FTCS spectral + residual conv-Laplacian;
    the Ruthotto blocks are σ(BN(K·Y))-nonlinear and excluded)."""
    from .amp import _ADI_CLASSES, iter_modules
    from .residual import ResidualDiffusion
    from .spectral import FourierFTCSLayer

    return iter_modules(
        module, _ADI_CLASSES + (FourierFTCSLayer, ResidualDiffusion))
