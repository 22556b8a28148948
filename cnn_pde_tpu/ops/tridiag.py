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
    "tridiag_solve_pcr_fused",
    "tridiag_solve_precomputed",
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
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    # zero the out-of-matrix entries by concat, not .at[].set (lane-axis
    # updates lower to unaligned dynamic-update-slices — PERF.md)
    a = jnp.concatenate([jnp.zeros_like(a[..., :1]), a[..., 1:]], axis=-1)
    c = jnp.concatenate([c[..., :-1], jnp.zeros_like(c[..., :1])], axis=-1)

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


def tridiag_solve_pcr_fused(a, b, c, d):
    """PCR with the BATCHED RHS updated in fused level pairs (VERDICT r4 #5
    — the directed shot at the sweep-core roofline gap).

    The standard PCR applies log2(N) sequential d-updates, each streaming
    the full batched RHS in and out of HBM (the coefficient chains are
    batch-free and negligible).  Two consecutive levels
        d1[j] = d[j] + a1[j]·d[j−s] + g1[j]·d[j+s]
        d2[j] = d1[j] + a2[j]·d1[j−2s] + g2[j]·d1[j+2s]
    compose into ONE 7-tap batched pass with batch-free composite weights
    (expand d1 inside d2; the ±s taps pick up the cross terms):
        w[−3s] = a2·a1(j−2s)      w[+3s] = g2·g1(j+2s)
        w[−2s] = a2               w[+2s] = g2
        w[−s]  = a1 + a2·g1(j−2s) w[+s]  = g1 + g2·a1(j+2s)
    halving the RHS memory passes (5 levels → 3 passes at N=32).
    Identical system ⇒ identical answer up to float association order.
    Measured outcome recorded in PERF.md §roofline either way.
    """
    N = d.shape[-1]
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    a = jnp.concatenate([jnp.zeros_like(a[..., :1]), a[..., 1:]], axis=-1)
    c = jnp.concatenate([c[..., :-1], jnp.zeros_like(c[..., :1])], axis=-1)

    def shift_right(x, s, fill):
        pad = [(0, 0)] * (x.ndim - 1) + [(s, 0)]
        return jnp.pad(x, pad, constant_values=fill)[..., :N]

    def shift_left(x, s, fill):
        pad = [(0, 0)] * (x.ndim - 1) + [(0, s)]
        return jnp.pad(x, pad, constant_values=fill)[..., s:]

    # batch-free coefficient reduction, recording each level's (alpha, gamma)
    levels = max(1, (N - 1).bit_length())
    coefs = []
    s = 1
    for _ in range(levels):
        alpha = -a / shift_right(b, s, 1.0)
        gamma = -c / shift_left(b, s, 1.0)
        coefs.append((alpha, gamma, s))
        a, b, c = (alpha * shift_right(a, s, 0.0),
                   b + alpha * shift_right(c, s, 0.0)
                   + gamma * shift_left(a, s, 0.0),
                   gamma * shift_left(c, s, 0.0))
        s *= 2

    # fused application to the batched RHS, two levels per pass
    i = 0
    while i < len(coefs):
        if i + 1 < len(coefs):
            a1, g1, s1 = coefs[i]
            a2, g2, s2 = coefs[i + 1]
            w_m3 = a2 * shift_right(a1, s2, 0.0)
            w_m1 = a1 + a2 * shift_right(g1, s2, 0.0)
            w_p1 = g1 + g2 * shift_left(a1, s2, 0.0)
            w_p3 = g2 * shift_left(g1, s2, 0.0)
            d = (d
                 + w_m1 * shift_right(d, s1, 0.0)
                 + w_p1 * shift_left(d, s1, 0.0)
                 + a2 * shift_right(d, s2, 0.0)
                 + g2 * shift_left(d, s2, 0.0)
                 + w_m3 * shift_right(d, 3 * s1, 0.0)
                 + w_p3 * shift_left(d, 3 * s1, 0.0))
            i += 2
        else:
            a1, g1, s1 = coefs[i]
            d = (d + a1 * shift_right(d, s1, 0.0)
                 + g1 * shift_left(d, s1, 0.0))
            i += 1
    return d / b


def tridiag_inverse_operator(a, b, c, dtype=jnp.float32):
    """Explicit inverse of the tridiagonal operator as a stack of small dense
    matrices, computed by PCR on an identity RHS.

    Returns X with X[..., k, i] = (T^{-1})[i, k], so that applying the solve
    to a batched RHS is one matmul:  x = d @ X  (see _apply_inverse).

    The point (TPU-first): every ADI sweep in this codebase has BATCH-FREE
    coefficients (an (H, N) or (C·H, N) field broadcast over the batch), so
    the inverse costs rows ∝ H·N — independent of batch size — and the
    batched work collapses from log2(N) elementwise PCR levels over the full
    (B·C·H, N) RHS to a single MXU matmul pass over it.  The backward reuses
    the same X (transposed application), eliminating the adjoint solve.
    """
    eye = jnp.eye(a.shape[-1] if hasattr(a, "shape") else b.shape[-1],
                  dtype=jnp.float32)
    X = tridiag_solve_pcr(a[..., None, :], b[..., None, :],
                          c[..., None, :], eye)
    # computed in f32, STORED at dtype (e.g. bf16 for the AMP-analogue
    # matinv_bf16 / hoisted-bf16 paths — the apply matmul then runs in
    # native MXU mode, see _inv_apply_einsum)
    return X.astype(dtype)


def _inv_apply_einsum(X, d, transpose):
    """Batched application of the inverse operator as MXU matmuls.

    The coefficient-batch dims of X (all but its last two) are made the
    dot_general BATCH dims and the true batch dims of d become the M dim —
    per coefficient row one (M, N) @ (N, N) matmul instead of M degenerate
    (1, N) products.  HIGHEST precision keeps the PDE parity surface
    exact-f32 (the repo invariant for any matmul on this surface); a bf16 X
    (the 'matinv_bf16' impl — the AMP-analogue opt-in) runs the matmul at
    native MXU precision with f32 accumulation instead."""
    cb = X.ndim - 2
    if d.ndim - 1 < cb:  # rare: RHS has fewer dims than the coefficient batch
        d = jnp.reshape(d, (1,) * (cb + 1 - d.ndim) + d.shape)
    extra = d.ndim - 1 - cb
    # einsum has no implicit broadcasting — materialize (free XLA views) any
    # size-1 dims between X's coefficient-batch dims and d's matching dims
    cb_shape = jnp.broadcast_shapes(X.shape[:-2], d.shape[extra:-1])
    X = jnp.broadcast_to(X, cb_shape + X.shape[-2:])
    d = jnp.broadcast_to(d, d.shape[:extra] + cb_shape + d.shape[-1:])
    if extra > 6 or cb > 6:
        raise ValueError(
            f"_inv_apply_einsum supports at most 6 extra batch dims and 6 "
            f"coefficient-batch dims (got extra={extra}, cb={cb}); reshape "
            f"the leading batch dims into one before calling")
    L = "abcdef"[:extra]
    C = "mnopqr"[:cb]
    rhs = f"{C}ki" if not transpose else f"{C}ik"
    if X.dtype == jnp.bfloat16:
        return jnp.einsum(f"{L}{C}k,{rhs}->{L}{C}i",
                          d.astype(jnp.bfloat16), X,
                          preferred_element_type=jnp.float32)
    return jnp.einsum(f"{L}{C}k,{rhs}->{L}{C}i", d, X,
                      precision=lax.Precision.HIGHEST)


def _apply_inverse(X, d):
    """x = T^{-1} d via x[..., i] = Σ_k d[..., k] · X[..., k, i]."""
    return _inv_apply_einsum(X, d, transpose=False)


def _apply_inverse_T(X, g):
    """λ = T^{-T} g via λ[..., k] = Σ_i X[..., k, i] · g[..., i]."""
    return _inv_apply_einsum(X, g, transpose=True)


def tridiag_solve_with_operator(a, b, c, d, X):
    """Solve T x = d given a PRECOMPUTED inverse operator X of T (from
    tridiag_inverse_operator), differentiably — without ever differentiating
    through X.

    Implicit-function formulation with one step of iterative refinement::

        x₀ = sg(X d)                      (sg = stop_gradient)
        x  = x₀ + sg(X)(d − T x₀)

    * primal: X·T ≈ I so x ≈ x₀ plus a Richardson-refinement correction —
      numerically CLOSER to the exact solve than X d alone;
    * tangent: dx = X(dd − dT·x₀) — the exact first-order derivative, so
      XLA's autodiff of the elementwise T·x₀ term yields the analytic
      adjoint (λ = T⁻ᵀ g via one transposed matmul; grad_b = −λ∘x₀,
      grad_a[i] = −λ[i]x₀[i−1], grad_c[i] = −λ[i]x₀[i+1]) with no custom
      VJP and — critically — a symbolic-zero cotangent for X, so nothing
      operator-sized ever hits the backward pass.

    (a, b, c) must be the SAME coefficients X was built from (including any
    +eps shift); they carry the gradient path.
    """
    Xs = lax.stop_gradient(X)
    x0 = lax.stop_gradient(_apply_inverse(Xs, d))
    # T x₀ along the last axis; a[0] and c[N-1] sit outside the matrix and
    # the zero-filled shifts drop them exactly as the solvers do.
    zero = jnp.zeros_like(x0[..., :1])
    x_lo = jnp.concatenate([zero, x0[..., :-1]], axis=-1)
    x_hi = jnp.concatenate([x0[..., 1:], zero], axis=-1)
    resid = d - (b * x0 + a * x_lo + c * x_hi)
    return x0 + _apply_inverse(Xs, resid)


_DEFAULT_IMPL = "auto"  # resolved lazily: 'pcr' everywhere (measured best)


def set_default_impl(impl: str):
    """Select the forward/adjoint solver implementation:
      'scan'   sequential Thomas (bit-closest to the reference recurrence)
      'pcr'    log-depth cyclic reduction (vectorized XLA)
      'pcr2'   PCR with the batched RHS updated in fused level pairs —
               measured NEGATIVE on v5e (core −6%, step −10%; PERF.md
               §pcr2), kept as a tested opt-in
      'matinv' batch-free explicit inverse + one MXU matmul per solve
               (coefficients must broadcast over the batch — true for every
               ADI sweep here; measured ≈ pcr on v5e, see PERF.md)
      'matinv_bf16' matinv with the inverse operator and matmul operands in
               bf16 (f32 accumulation) — the AMP-analogue opt-in (the
               reference trains both CIFAR models under autocast,
               cifar10.py:440); NOT on the exact-parity surface
      'pallas' fused VMEM kernel (TPU only; bit-exact vs 'scan')
      'auto'   pcr (measured fastest in chained training loops)
    Returns the previous setting."""
    global _DEFAULT_IMPL
    assert impl in ("scan", "pcr", "pcr2", "matinv", "matinv_bf16",
                    "pallas", "auto"), impl
    prev = _DEFAULT_IMPL
    _DEFAULT_IMPL = impl
    return prev


def _resolve_impl():
    if _DEFAULT_IMPL != "auto":
        return _DEFAULT_IMPL
    # Measured on v5e (full CIFAR-10 train step, batch 64, PERF.md r2 A/B):
    # pcr 2.26 ms, matinv 2.30, matinv_bf16 1.94, pallas 6.80, scan 5.34.
    # PCR fuses into the surrounding XLA graph and is the fastest EXACT
    # impl; matinv_bf16 is 14% faster but half-precision (the AMP-analogue
    # opt-in — not a default on the parity surface).  The fused whole-layer
    # Pallas kernels are retired to opt-in status (PERF.md r2 decision).
    return "pcr"


def _solve_impl(a, b, c, d):
    impl = _resolve_impl()
    if impl == "pallas":
        from .pallas_thomas import _solve as pallas_solve

        return pallas_solve(a, b, c, d)
    if impl in ("matinv", "matinv_bf16"):
        dt = jnp.bfloat16 if impl == "matinv_bf16" else d.dtype
        return _apply_inverse(tridiag_inverse_operator(a, b, c, dt), d)
    if impl == "pcr":
        return tridiag_solve_pcr(a, b, c, d)
    if impl == "pcr2":
        return tridiag_solve_pcr_fused(a, b, c, d)
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
    impl = _resolve_impl()
    if impl in ("matinv", "matinv_bf16"):
        dt = jnp.bfloat16 if impl == "matinv_bf16" else d.dtype
        X = tridiag_inverse_operator(a, b, c, dt)
        x = _apply_inverse(X, d)
        # save X: the backward reuses it as the transposed application — no
        # second (adjoint) solve at all
        return x, (a, b, c, d, x, X)
    x = _solve_impl(a, b, c, d)
    return x, (a, b, c, d, x, None)


def _reduce_like(grad, ref):
    """Broadcast-aware reduction: fold a full-shaped gradient back onto a
    coefficient array that was broadcast against the RHS."""
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


def _adjoint_band_grads(a, b, c, d, x, lam):
    """Analytic tridiagonal-solve adjoint given λ = T^{-T} g: band cotangents
    grad_b = −λ∘x, grad_a[i] = −λ[i]x[i−1], grad_c[i] = −λ[i]x[i+1], and
    grad_d = λ, each reduced onto its input's (possibly broadcast) shape."""
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
    return (
        _reduce_like(grad_a, a),
        _reduce_like(grad_b, b),
        _reduce_like(grad_c, c),
        _reduce_like(grad_d, d),
    )


def _tridiag_bwd(res, g):
    a, b, c, d, x, X = res
    if X is not None:
        lam = _apply_inverse_T(X, g)  # λ = T^{-T} g, one matmul
    else:
        a_t, b_t, c_t = _transpose_system(a, b, c)
        lam = _solve_impl(a_t, b_t, c_t, g)  # λ = T^{-T} g
    return _adjoint_band_grads(a, b, c, d, x, lam)


tridiag_solve.defvjp(_tridiag_fwd, _tridiag_bwd)


@jax.custom_vjp
def tridiag_solve_precomputed(a, b, c, d, X):
    """Solve T x = d with a PRECOMPUTED inverse operator X (from
    tridiag_inverse_operator) — ONE MXU matmul forward, analytic adjoint
    reusing the same X (one transposed matmul + elementwise band grads)
    backward.

    This is the missing combination between the 'matinv' impls (which pay a
    fresh PCR inverse computation inside every sweep — the dominant
    batch-free traffic at small batch) and tridiag_solve_with_operator
    (which hoists the inverse but pays TWO matmuls per sweep for its
    refinement/implicit-function form).  Here the inverse is hoisted AND the
    apply is a single matmul.

    (a, b, c) must be the coefficients X was built from (including any +eps
    shift); they carry the gradient path.  X itself gets a zero cotangent
    (implicit-function theorem: the derivative of the exact solve depends on
    the bands, not on the inverse's representation), so nothing
    operator-sized flows into the backward graph.

    Primal numerics are those of the matinv/matinv_bf16 impls (x = X·d with
    no refinement): ~1e-7 relative for f32 X, ~4e-3 for bf16 X (the
    AMP-analogue, accuracy-validated in PERF.md §all-presets).
    """
    return _apply_inverse(X, d)


def _precomp_fwd(a, b, c, d, X):
    x = _apply_inverse(X, d)
    return x, (a, b, c, d, x, X)


def _precomp_bwd(res, g):
    a, b, c, d, x, X = res
    lam = _apply_inverse_T(X, g)  # λ = T^{-T} g, one matmul
    ga, gb, gc, gd = _adjoint_band_grads(a, b, c, d, x, lam)
    # X's zero cotangent lands in the stop_gradient it was built under
    # (sweep_operator) and is dropped there.
    return ga, gb, gc, gd, jnp.zeros_like(X)


tridiag_solve_precomputed.defvjp(_precomp_fwd, _precomp_bwd)


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
