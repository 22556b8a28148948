"""Batched tridiagonal (Thomas) solves — the L1 kernel under every implicit ADI sweep.

Reference semantics (reimplemented TPU-first, not copied):
  * ``thomas_solver_batch``            mnist_test.py:151-198, fashion_mnist.py:149-196,
                                        SVHN.py:183-230 (scatter variant)
  * ``thomas_solver_batch_optimized``  cifar10.py:179-211, cifar_2version.py:153-187
                                        (list/stack variant)

Both reference variants run the classic Thomas recurrence but add ``eps`` into every
forward-elimination denominator::

    denom_0 = b[0] + eps
    denom_i = b[i] - a[i] * c_star[i-1] + eps

Adding ``eps`` to every denominator is *exactly* the Thomas recurrence applied to the
modified matrix whose main diagonal is ``b + eps`` (the chain of c_star values is
consistent with that matrix).  We therefore expose an exact solver and let callers
pass ``b + eps`` — this reproduces the reference math bit-for-bit in exact arithmetic
while keeping the solver itself a pure linear solve, which gives us a clean analytic
adjoint (solve the transposed system) instead of the reference's unrolled-autograd
backward.

Layout note: the recurrence is sequential along the solve axis (length N = 28..64)
but embarrassingly parallel over rows (B*C*H = thousands).  The ``lax.scan``
implementation keeps the row axis fully vectorized so each of the N steps is one
wide VPU op; XLA compiles the scan into a single fused loop on TPU (vs. the
reference's ~2N separate torch kernel launches per solve).  A fused Pallas kernel
(`cnn_pde_tpu.ops.tridiag_pallas`) implements the same math with the whole tile
resident in VMEM.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "tridiag_solve",
    "tridiag_solve_scan",
    "tridiag_solve_pcr",
    "tridiag_solve_unrolled",
    "thomas_solve_reference",
    "set_default_impl",
]


def _thomas_scan(a, b, c, d):
    """Exact Thomas solve along the last axis, batched over leading axes.

    Solves  a[i]·x[i-1] + b[i]·x[i] + c[i]·x[i+1] = d[i]  with a[0] and c[N-1]
    ignored (outside the matrix), matching the reference recurrences.
    All args shape (..., N).
    """
    N = d.shape[-1]
    # Move the solve axis to the front so scan carries the full batch per step.
    aT = jnp.moveaxis(a, -1, 0)
    bT = jnp.moveaxis(b, -1, 0)
    cT = jnp.moveaxis(c, -1, 0)
    dT = jnp.moveaxis(d, -1, 0)

    cs0 = cT[0] / bT[0]
    ds0 = dT[0] / bT[0]

    def fwd(carry, abcd):
        cs_prev, ds_prev = carry
        ai, bi, ci, di = abcd
        denom = bi - ai * cs_prev
        cs = ci / denom
        ds = (di - ai * ds_prev) / denom
        return (cs, ds), (cs, ds)

    (_, _), (cs_rest, ds_rest) = lax.scan(
        fwd, (cs0, ds0), (aT[1:], bT[1:], cT[1:], dT[1:])
    )
    cs = jnp.concatenate([cs0[None], cs_rest], axis=0)  # (N, ...)
    ds = jnp.concatenate([ds0[None], ds_rest], axis=0)

    xN = ds[-1]

    def bwd(x_next, csds):
        cs_i, ds_i = csds
        x_i = ds_i - cs_i * x_next
        return x_i, x_i

    _, xs = lax.scan(bwd, xN, (cs[:-1], ds[:-1]), reverse=True)
    x = jnp.concatenate([xs, xN[None]], axis=0)
    return jnp.moveaxis(x, 0, -1)


def tridiag_solve_scan(a, b, c, d):
    """Differentiable-by-scan exact Thomas solve (no custom VJP) — used as the
    gradient cross-check oracle in tests."""
    return _thomas_scan(a, b, c, d)


def tridiag_solve_pcr(a, b, c, d):
    """Parallel cyclic reduction: solves the SAME tridiagonal system as the
    Thomas recurrence in ceil(log2 N) fully-vectorized levels instead of 2N
    sequential steps — the TPU-native formulation (every level is elementwise
    VPU work over the whole (batch, N) tile; no sequential scan).

    Identical system ⇒ identical answer up to float roundoff (both are stable
    solves of a diagonally-dominant matrix); parity with the reference's eps'd
    recurrence holds at ≤1e-5 (tested).
    """
    N = d.shape[-1]
    # The coefficient reduction is batch-independent whenever (a, b, c) are
    # broadcast against a batched d (every ADI sweep in this codebase): keep
    # them at their natural shape so only the d-update runs at batch size —
    # ~2.5× less HBM traffic per level.
    a = jnp.asarray(a).at[..., 0].set(0.0)   # a[0] sits outside the matrix
    b = jnp.asarray(b)
    c = jnp.asarray(c).at[..., -1].set(0.0)  # c[N-1] sits outside the matrix

    def shift_right(x, s, fill):
        # x[i-s], out-of-range -> fill
        pad = [(0, 0)] * (x.ndim - 1) + [(s, 0)]
        return jnp.pad(x, pad, constant_values=fill)[..., :N]

    def shift_left(x, s, fill):
        pad = [(0, 0)] * (x.ndim - 1) + [(0, s)]
        return jnp.pad(x, pad, constant_values=fill)[..., s:]

    levels = max(1, (N - 1).bit_length())
    s = 1
    for _ in range(levels):
        alpha = -a / shift_right(b, s, 1.0)
        gamma = -c / shift_left(b, s, 1.0)
        a_new = alpha * shift_right(a, s, 0.0)
        c_new = gamma * shift_left(c, s, 0.0)
        b_new = b + alpha * shift_right(c, s, 0.0) + gamma * shift_left(a, s, 0.0)
        d_new = d + alpha * shift_right(d, s, 0.0) + gamma * shift_left(d, s, 0.0)
        a, b, c, d = a_new, b_new, c_new, d_new
        s *= 2
    return d / b


_DEFAULT_IMPL = "auto"  # resolved lazily: 'pallas' on TPU, 'pcr' elsewhere


def set_default_impl(impl: str):
    """Select the forward/adjoint solver implementation:
      'scan'   sequential Thomas (bit-closest to the reference recurrence)
      'pcr'    log-depth cyclic reduction (vectorized XLA)
      'pallas' fused VMEM kernel (TPU only; bit-exact vs 'scan')
      'auto'   pallas on TPU, pcr otherwise
    Returns the previous setting."""
    global _DEFAULT_IMPL
    assert impl in ("scan", "pcr", "pallas", "auto"), impl
    prev = _DEFAULT_IMPL
    _DEFAULT_IMPL = impl
    return prev


def _resolve_impl():
    if _DEFAULT_IMPL != "auto":
        return _DEFAULT_IMPL
    # Measured on v5e (full CIFAR-10 train step, batch 64): pcr 1.9 ms,
    # pallas 2.9 ms, scan 2.5 ms.  PCR fuses into the surrounding XLA graph;
    # the per-sweep pallas_call launches + layout transposes don't (yet) —
    # the fused-whole-layer kernel is the planned flip point.
    return "pcr"


def _solve_impl(a, b, c, d):
    impl = _resolve_impl()
    if impl == "pallas":
        from .pallas_thomas import _solve as pallas_solve

        return pallas_solve(a, b, c, d)
    if impl == "pcr":
        return tridiag_solve_pcr(a, b, c, d)
    return _thomas_scan(a, b, c, d)


def _transpose_system(a, b, c):
    """Coefficients of T^T for tridiag T=(a,b,c): sub'[i]=c[i-1], super'[i]=a[i+1]."""
    a_t = jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    c_t = jnp.concatenate([a[..., 1:], jnp.zeros_like(a[..., :1])], axis=-1)
    return a_t, b, c_t


@jax.custom_vjp
def tridiag_solve(a, b, c, d):
    """Batched Thomas solve with an analytic adjoint.

    x = T^{-1} d with T = tridiag(a, b, c), solved along the last axis.
    Callers reproducing the reference's eps'd recurrence pass ``b + eps``
    (see module docstring).  The VJP solves the transposed system — O(N)
    work and memory instead of the reference's unrolled autograd replay
    (mnist_test.py:304 replays 2,352 scatter iterations per batch).
    The forward/adjoint implementation is selected by set_default_impl
    ('scan' or 'pcr'); both solve the identical system.
    """
    return _solve_impl(a, b, c, d)


def _tridiag_fwd(a, b, c, d):
    x = _solve_impl(a, b, c, d)
    return x, (a, b, c, d, x)


def _tridiag_bwd(res, g):
    a, b, c, d, x = res
    a_t, b_t, c_t = _transpose_system(a, b, c)
    lam = _solve_impl(a_t, b_t, c_t, g)  # λ = T^{-T} g
    grad_d = lam
    grad_b = -lam * x
    # grad_a[i] = -λ[i]·x[i-1] (a[0] is outside the matrix → zero grad)
    grad_a = jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), -lam[..., 1:] * x[..., :-1]], axis=-1
    )
    # grad_c[i] = -λ[i]·x[i+1] (c[N-1] is outside the matrix → zero grad)
    grad_c = jnp.concatenate(
        [-lam[..., :-1] * x[..., 1:], jnp.zeros_like(x[..., :1])], axis=-1
    )
    # Broadcast-aware reduction: inputs may have been broadcast against d.
    def _reduce_like(grad, ref):
        if grad.shape == ref.shape:
            return grad
        # reduce broadcast axes: match trailing dims, then sum extra leading
        axes = tuple(
            grad.ndim - 1 - i
            for i, (gs, rs) in enumerate(
                zip(grad.shape[::-1], ref.shape[::-1]))
            if rs == 1 and gs != 1
        )
        if axes:
            grad = jnp.sum(grad, axis=axes, keepdims=True)
        extra = grad.ndim - ref.ndim
        if extra:
            grad = jnp.sum(grad, axis=tuple(range(extra)))
        return jnp.reshape(grad, ref.shape)

    return (
        _reduce_like(grad_a, a),
        _reduce_like(grad_b, b),
        _reduce_like(grad_c, c),
        _reduce_like(grad_d, d),
    )


tridiag_solve.defvjp(_tridiag_fwd, _tridiag_bwd)


def tridiag_solve_unrolled(a, b, c, d):
    """Pure-python unrolled Thomas — slow trace, used only in tests as an oracle
    mirroring the reference's loop structure (mnist_test.py:176-196)."""
    N = d.shape[-1]
    cs = [c[..., 0] / b[..., 0]]
    ds = [d[..., 0] / b[..., 0]]
    for i in range(1, N):
        denom = b[..., i] - a[..., i] * cs[i - 1]
        cs.append(c[..., i] / denom)
        ds.append((d[..., i] - a[..., i] * ds[i - 1]) / denom)
    xs = [None] * N
    xs[-1] = ds[-1]
    for i in range(N - 2, -1, -1):
        xs[i] = ds[i] - cs[i] * xs[i + 1]
    return jnp.stack(xs, axis=-1)


def thomas_solve_reference(a, b, c, d, eps=1e-6):
    """The reference-facing entry point: Thomas with eps added into every
    denominator (mnist_test.py:169,177), i.e. an exact solve on b+eps."""
    return tridiag_solve(a, b + eps, c, d)
