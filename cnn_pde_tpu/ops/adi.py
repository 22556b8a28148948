"""Implicit directional diffusion sweeps (K4/K5) — the shared engine under every
ADI-based PDE layer variant.

Reference semantics (SURVEY.md §2.1):
  * ``diffuse_x_vectorized``  mnist_test.py:67-98, SVHN.py:88-124, cifar10.py:124-148
  * ``diffuse_y_vectorized``  mnist_test.py:100-133, SVHN.py:126-165, cifar10.py:150-177

One implicit backward-Euler sweep along an axis solves, per 1-D line,
    (I - dt/dx²·diag(α)·Δ₁) u_new = u
discretised as the tridiagonal system  a=-r, b=1+2r, c=-r  with  r = α·dt/dx²,
and Neumann (no-flux) boundaries folded in as b[0]=1+r[0], b[-1]=1+r[-1]
(mnist_test.py:92-93).

TPU-first design: the reference reshapes to (B·H, W) and runs a python-loop Thomas
(thousands of kernel launches).  Here the sweep is a single batched
``tridiag_solve`` whose scan keeps the full row-batch vectorized per step; the
y-sweep transposes the last two axes so the solve axis is always trailing
(lane-contiguous).  Coefficients are batch-independent in every reference variant
(expanded from an (H, W) or (C, H, W) field), so we keep them unexpanded and let
broadcasting do the work — no (B·H, W) materialisation.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .smoothing import smooth3
from .tridiag import (
    tridiag_inverse_operator,
    tridiag_solve,
    tridiag_solve_precomputed,
    tridiag_solve_with_operator,
)

__all__ = ["sweep_x", "sweep_y", "sweep_last_axis",
           "sweep_operator", "apply_sweep", "apply_sweep_y"]


def sweep_last_axis(u, coeff_field, dt, dx, *, smooth: bool, eps: float):
    """One implicit diffusion sweep along the trailing axis.

    u:           (..., N)   state lines
    coeff_field: broadcastable to u's shape, e.g. (H, N) vs (B, H, N)
    smooth:      apply the 3-tap replicate moving average (K6) along the sweep
                 axis first (True for mnist/fashion/SVHN, False for both CIFAR
                 variants — parity-relevant, SURVEY.md §2.1 K6).
    eps:         stability eps added to every Thomas denominator, reproduced
                 exactly as b+eps (see ops.tridiag docstring).
    """
    if smooth:
        coeff_field = smooth3(coeff_field, axis=-1)
    r = coeff_field * (dt / (dx * dx))
    # Deliberately NOT broadcast to u's batch shape: the reference expands the
    # (H, W) field to (B·H, W) (mnist_test.py:79), but the c*-chain of the Thomas
    # forward elimination depends only on (a, b, c); keeping them batch-free lets
    # the solver share one elimination chain across the whole batch.
    a = -r
    c = -r
    # Neumann rows via concat, not .at[].set: lane-axis updates lower to
    # unaligned dynamic-update-slices (bit-identical; flagship step
    # 2.52 → 2.39 ms, PERF.md)
    b = _neumann_b(r)
    return tridiag_solve(a, b + eps, c, u)


def _neumann_b(r):
    """b = 1+2r with the Neumann BC rows b[0] = 1+r[0], b[-1] = 1+r[-1]
    (mnist_test.py:92-93), assembled by concatenation along the sweep axis."""
    if r.shape[-1] == 1:  # degenerate width-1 axis: both BC rows coincide
        return 1.0 + r
    return jnp.concatenate([1.0 + r[..., :1], 1.0 + 2.0 * r[..., 1:-1],
                            1.0 + r[..., -1:]], axis=-1)


def sweep_x(u, alpha, dt, dx, *, smooth: bool, eps: float):
    """Sweep along the last axis (W) of (..., H, W) with α broadcast over batch."""
    return sweep_last_axis(u, alpha, dt, dx, smooth=smooth, eps=eps)


def sweep_y(u, beta, dt, dy, *, smooth: bool, eps: float):
    """Sweep along the second-to-last axis (H): transpose, sweep, transpose back
    (mnist_test.py:108-133)."""
    u_t = jnp.swapaxes(u, -1, -2)
    beta_t = jnp.swapaxes(beta, -1, -2)
    out = sweep_last_axis(u_t, beta_t, dt, dy, smooth=smooth, eps=eps)
    return jnp.swapaxes(out, -1, -2)


# ---- hoisted-operator formulation -------------------------------------------
#
# Every sweep's coefficients are batch-free AND its evaluation times are
# static, so the solve operator can be precomputed for ALL steps/substeps of
# an evolution in one batched PCR call (rows ∝ steps·C·H·N — independent of
# the batch size), leaving the sequential step loop as pure MXU matmuls.
# This trades log2(N) elementwise PCR levels over the batched RHS per sweep
# for a single matmul pass, and makes the backward a transposed matmul
# (autodiff) instead of a second adjoint solve per sweep.


def sweep_operator(coeff_field, dt, dx, *, smooth: bool, eps: float,
                   dtype=jnp.float32):
    """Precompute a sweep's solve operator for coefficient field(s) (..., N) —
    leading dims may enumerate steps/substeps/channels.  Semantics identical
    to sweep_last_axis: Neumann BC rows, b+eps, optional 3-tap smoothing of
    the coefficients along the sweep axis.

    Returns ops = (a, b+eps, c, X): the differentiable tridiagonal bands plus
    the inverse operator X computed under stop_gradient (gradients flow
    through the bands via the implicit-function form in apply_sweep, never
    through X — see tridiag_solve_with_operator)."""
    if smooth:
        coeff_field = smooth3(coeff_field, axis=-1)
    r = coeff_field * (dt / (dx * dx))
    a = -r
    c = -r
    b = _neumann_b(r) + eps
    X = tridiag_inverse_operator(lax.stop_gradient(a), lax.stop_gradient(b),
                                 lax.stop_gradient(c), dtype)
    return a, b, c, X


def apply_sweep(ops, u, *, refine=False):
    """u ← T⁻¹ u along the trailing axis (one MXU matmul per coefficient row;
    the operator's batch dims broadcast over u's leading batch dims).

    refine=False (default): single-matmul apply with the analytic adjoint
    reusing X (tridiag_solve_precomputed — the fast path).
    refine=True: the implicit-function form x₀ + X(d − T·x₀) — two matmuls,
    one Richardson refinement, gradients by autodiff of the residual term
    (tridiag_solve_with_operator; kept for study/A-B)."""
    a, b, c, X = ops
    if refine:
        return tridiag_solve_with_operator(a, b, c, u, X)
    return tridiag_solve_precomputed(a, b, c, u, X)


def apply_sweep_y(ops, u, *, refine=False):
    """y-direction apply: ops were built from the TRANSPOSED coefficient field
    (solve axis = H); transpose u, apply, transpose back."""
    a, b, c, X = ops
    u_t = jnp.swapaxes(u, -1, -2)
    if refine:
        out = tridiag_solve_with_operator(a, b, c, u_t, X)
    else:
        out = tridiag_solve_precomputed(a, b, c, u_t, X)
    return jnp.swapaxes(out, -1, -2)
