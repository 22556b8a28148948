"""Unit tests for the batched Thomas solver (K1/K2 parity + gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.ops import (
    thomas_solve_reference,
    tridiag_solve,
    tridiag_solve_scan,
    tridiag_solve_unrolled,
)
from cnn_pde_tpu.ops.tridiag import set_default_impl, tridiag_solve_pcr


def random_system(rng, batch, n, diag_dominant=True):
    a = rng.standard_normal((batch, n)).astype(np.float32) * 0.3
    c = rng.standard_normal((batch, n)).astype(np.float32) * 0.3
    b = rng.standard_normal((batch, n)).astype(np.float32) * 0.1
    if diag_dominant:
        b = b + 2.0 + np.abs(a) + np.abs(c)
    d = rng.standard_normal((batch, n)).astype(np.float32)
    return a, b, c, d


def dense_solve(a, b, c, d):
    """Oracle: dense numpy solve of the same tridiagonal systems."""
    batch, n = d.shape
    out = np.zeros_like(d)
    for k in range(batch):
        T = np.zeros((n, n), dtype=np.float64)
        for i in range(n):
            T[i, i] = b[k, i]
            if i > 0:
                T[i, i - 1] = a[k, i]
            if i < n - 1:
                T[i, i + 1] = c[k, i]
        out[k] = np.linalg.solve(T, d[k].astype(np.float64)).astype(np.float32)
    return out


@pytest.mark.parametrize("n", [4, 28, 32, 64])
def test_matches_dense_solve(rng, n):
    a, b, c, d = random_system(rng, 16, n)
    x = np.asarray(tridiag_solve(a, b, c, d))
    x_ref = dense_solve(a, b, c, d)
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-5)


def test_scan_matches_unrolled(rng):
    a, b, c, d = random_system(rng, 8, 28)
    x_scan = np.asarray(tridiag_solve_scan(a, b, c, d))
    x_unr = np.asarray(tridiag_solve_unrolled(a, b, c, d))
    np.testing.assert_allclose(x_scan, x_unr, rtol=1e-6, atol=1e-7)


def test_eps_semantics_matches_reference_recurrence(rng):
    """solve(a, b+eps, c, d) must equal the reference's eps-in-denominator
    recurrence (mnist_test.py:169,177) run literally."""
    eps = 1e-6
    a, b, c, d = random_system(rng, 8, 28)

    # Literal port of the reference recurrence as an oracle (float64).
    a64, b64, c64, d64 = (v.astype(np.float64) for v in (a, b, c, d))
    n = d.shape[-1]
    cs = np.zeros_like(d64)
    ds = np.zeros_like(d64)
    cs[:, 0] = c64[:, 0] / (b64[:, 0] + eps)
    ds[:, 0] = d64[:, 0] / (b64[:, 0] + eps)
    for i in range(1, n):
        denom = b64[:, i] - a64[:, i] * cs[:, i - 1] + eps
        if i < n - 1:
            cs[:, i] = c64[:, i] / denom
        ds[:, i] = (d64[:, i] - a64[:, i] * ds[:, i - 1]) / denom
    x_ref = np.zeros_like(d64)
    x_ref[:, -1] = ds[:, -1]
    for i in range(n - 2, -1, -1):
        x_ref[:, i] = ds[:, i] - cs[:, i] * x_ref[:, i + 1]

    x = np.asarray(thomas_solve_reference(a, b, c, d, eps=eps))
    np.testing.assert_allclose(x, x_ref, rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_autodiff_through_scan(rng):
    a, b, c, d = random_system(rng, 4, 16)

    def loss_custom(a, b, c, d):
        return jnp.sum(jnp.sin(tridiag_solve(a, b, c, d)))

    def loss_scan(a, b, c, d):
        return jnp.sum(jnp.sin(tridiag_solve_scan(a, b, c, d)))

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(a, b, c, d)
    g_scan = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(a, b, c, d)
    for gc, gs, name in zip(g_custom, g_scan, "abcd"):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gs), rtol=2e-3, atol=2e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_boundary_coeffs_get_zero_grad(rng):
    """a[0] and c[N-1] sit outside the matrix: zero gradient, like the
    reference's autograd through its recurrence."""
    a, b, c, d = random_system(rng, 4, 8)
    g = jax.grad(lambda a, c: jnp.sum(tridiag_solve(a, b, c, d) ** 2),
                 argnums=(0, 1))(jnp.asarray(a), jnp.asarray(c))
    assert np.all(np.asarray(g[0])[:, 0] == 0)
    assert np.all(np.asarray(g[1])[:, -1] == 0)


@pytest.mark.parametrize("n", [4, 7, 28, 32, 64])
def test_pcr_matches_scan(rng, n):
    """Cyclic reduction solves the identical system: agreement to float32
    roundoff (~1e-6), far inside the 1e-5 parity budget."""
    a, b, c, d = random_system(rng, 32, n)
    x_scan = np.asarray(tridiag_solve_scan(a, b, c, d))
    x_pcr = np.asarray(tridiag_solve_pcr(a, b, c, d))
    np.testing.assert_allclose(x_pcr, x_scan, rtol=1e-5, atol=2e-6)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 7, 28, 32, 33, 64])
def test_pcr_fused_matches_scan(rng, n):
    """The fused-level-pair PCR (impl 'pcr2' — halved RHS memory passes,
    VERDICT r4 #5) solves the identical system: agreement to float32
    roundoff, including odd sizes and the degenerate N=1/2/3 cases where
    the pairing leaves a trailing single level."""
    from cnn_pde_tpu.ops.tridiag import tridiag_solve_pcr_fused

    a, b, c, d = random_system(rng, 32, n)
    x_scan = np.asarray(tridiag_solve_scan(a, b, c, d))
    x_f = np.asarray(tridiag_solve_pcr_fused(a, b, c, d))
    np.testing.assert_allclose(x_f, x_scan, rtol=1e-5, atol=2e-6)


def test_pcr_fused_batch_free_coefficients(rng):
    """pcr2 keeps (a, b, c) batch-free (the ADI invariant): broadcastable
    coefficient shapes must produce the same answer as expanded ones."""
    from cnn_pde_tpu.ops.tridiag import tridiag_solve_pcr_fused

    n = 32
    a, b, c, d = random_system(rng, 4, n)
    a1, b1, c1 = a[0], b[0], c[0]  # (n,) broadcast over the batch
    d = np.broadcast_to(d[0], (6, 4, n)).copy()
    x_bc = np.asarray(tridiag_solve_pcr_fused(a1, b1, c1, d))
    x_full = np.asarray(tridiag_solve_pcr_fused(
        np.broadcast_to(a1, d.shape), np.broadcast_to(b1, d.shape),
        np.broadcast_to(c1, d.shape), d))
    np.testing.assert_allclose(x_bc, x_full, rtol=1e-6, atol=1e-7)


def test_pcr_mode_layer_parity(rng, key):
    """A full PDE layer under impl='pcr' must still match the float64 golden
    oracle at 1e-5 (the activation-parity budget)."""
    import jax.numpy as jnp

    from cnn_pde_tpu.pde import GrayscaleDiffusion
    from tests.golden import reference_numpy as refnp

    layer = GrayscaleDiffusion(size=28, dt=0.001, num_steps=10, init_value=2.0)
    params, state = layer.init(key)
    u = rng.random((2, 1, 28, 28)).astype(np.float32)
    prev = set_default_impl("pcr")
    try:
        out, _ = layer(params, state, jnp.asarray(u))
    finally:
        set_default_impl(prev)
    golden = refnp.grayscale_forward_np(
        u, {k: np.asarray(v) for k, v in params.items()}, 0.001, 1.0, 1.0, 10)
    np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-5, atol=1e-5)


def test_pcr_gradient_matches_scan_gradient(rng):
    a, b, c, d = random_system(rng, 8, 16)

    def loss(d, impl):
        prev = set_default_impl(impl)
        try:
            return jnp.sum(jnp.sin(tridiag_solve(a, b, c, d)))
        finally:
            set_default_impl(prev)

    g_scan = jax.grad(lambda d: loss(d, "scan"))(jnp.asarray(d))
    g_pcr = jax.grad(lambda d: loss(d, "pcr"))(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(g_pcr), np.asarray(g_scan),
                               rtol=1e-4, atol=1e-6)


def test_broadcast_coefficients(rng):
    """Batch-free (a,b,c) against batched d — the shared-elimination-chain path."""
    a, b, c, _ = random_system(rng, 1, 24)
    a, b, c = a[0], b[0], c[0]
    d = rng.standard_normal((32, 24)).astype(np.float32)
    x = np.asarray(tridiag_solve(a, b, c, d))
    x_full = np.asarray(
        tridiag_solve(
            np.broadcast_to(a, d.shape).copy(),
            np.broadcast_to(b, d.shape).copy(),
            np.broadcast_to(c, d.shape).copy(),
            d,
        )
    )
    np.testing.assert_allclose(x, x_full, rtol=1e-6, atol=1e-7)

    # gradient through broadcast path reduces correctly
    ga = jax.grad(
        lambda a: jnp.sum(tridiag_solve(a, b, c, d))
    )(jnp.asarray(a))
    assert ga.shape == a.shape


def test_matinv_impl_matches_scan(rng):
    """'matinv' (batch-free explicit inverse + MXU matmul) must agree with
    the scan recurrence — forward and all four gradients — across
    coefficient/RHS broadcast patterns."""
    for cshape, dshape in [((7, 16), (5, 3, 7, 16)), ((3, 7, 16), (5, 3, 7, 16)),
                           ((1, 16), (5, 4, 16)), ((7, 16), (16,))]:
        r = jnp.asarray(rng.random(cshape).astype(np.float32)) * 0.5
        a, c, b = -r, -r, 1 + 2 * r
        d = jnp.asarray(rng.standard_normal(dshape).astype(np.float32))

        def loss(a, b, c, d):
            return jnp.sum(tridiag_solve(a, b, c, d) ** 2)

        prev = set_default_impl("scan")
        try:
            x_ref = tridiag_solve(a, b, c, d)
            g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(a, b, c, d)
            set_default_impl("matinv")
            x_mi = tridiag_solve(a, b, c, d)
            g_mi = jax.grad(loss, argnums=(0, 1, 2, 3))(a, b, c, d)
        finally:
            set_default_impl(prev)
        np.testing.assert_allclose(np.asarray(x_mi), np.asarray(x_ref),
                                   rtol=0, atol=5e-6)
        for u, v in zip(g_mi, g_ref):
            scale = max(1.0, float(jnp.max(jnp.abs(v))))
            np.testing.assert_allclose(np.asarray(u) / scale,
                                       np.asarray(v) / scale,
                                       rtol=0, atol=5e-6)


def test_solve_with_operator_matches_solve(rng):
    """The implicit-function hoisted form (precomputed inverse + refinement)
    must match tridiag_solve forward and in its (a,b,c,d) gradients, with NO
    gradient flowing through the operator."""
    from cnn_pde_tpu.ops.tridiag import (tridiag_inverse_operator,
                                         tridiag_solve_with_operator)

    r = jnp.asarray(rng.random((5, 16)).astype(np.float32)) * 0.5
    a, c, b = -r, -r, 1 + 2 * r
    d = jnp.asarray(rng.standard_normal((4, 5, 16)).astype(np.float32))

    x_ref = tridiag_solve(a, b, c, d)
    g_ref = jax.grad(lambda *args: jnp.sum(tridiag_solve(*args) ** 2),
                     argnums=(0, 1, 2, 3))(a, b, c, d)

    X = tridiag_inverse_operator(jax.lax.stop_gradient(a),
                                 jax.lax.stop_gradient(b),
                                 jax.lax.stop_gradient(c))
    x_op = tridiag_solve_with_operator(a, b, c, d, X)
    g_op = jax.grad(
        lambda a, b, c, d: jnp.sum(
            tridiag_solve_with_operator(a, b, c, d, X) ** 2),
        argnums=(0, 1, 2, 3))(a, b, c, d)

    np.testing.assert_allclose(np.asarray(x_op), np.asarray(x_ref),
                               rtol=0, atol=5e-6)
    for u, v in zip(g_op, g_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(v))))
        np.testing.assert_allclose(np.asarray(u) / scale,
                                   np.asarray(v) / scale, rtol=0, atol=5e-6)


def test_solve_precomputed_matches_solve(rng):
    """The single-matmul hoisted apply (tridiag_solve_precomputed) must match
    tridiag_solve forward and in its (a,b,c,d) gradients, give d-gradients
    via one transposed matmul, and send a ZERO cotangent into X."""
    from cnn_pde_tpu.ops.tridiag import (tridiag_inverse_operator,
                                         tridiag_solve_precomputed)

    r = jnp.asarray(rng.random((5, 16)).astype(np.float32)) * 0.5
    a, c, b = -r, -r, 1 + 2 * r
    d = jnp.asarray(rng.standard_normal((4, 5, 16)).astype(np.float32))

    x_ref = tridiag_solve(a, b, c, d)
    g_ref = jax.grad(lambda *args: jnp.sum(tridiag_solve(*args) ** 2),
                     argnums=(0, 1, 2, 3))(a, b, c, d)

    X = tridiag_inverse_operator(a, b, c)
    x_pc = tridiag_solve_precomputed(a, b, c, d, X)
    g_pc = jax.grad(
        lambda a, b, c, d, X: jnp.sum(
            tridiag_solve_precomputed(a, b, c, d, X) ** 2),
        argnums=(0, 1, 2, 3, 4))(a, b, c, d, X)

    np.testing.assert_allclose(np.asarray(x_pc), np.asarray(x_ref),
                               rtol=0, atol=5e-6)
    for u, v in zip(g_pc[:4], g_ref):
        scale = max(1.0, float(jnp.max(jnp.abs(v))))
        np.testing.assert_allclose(np.asarray(u) / scale,
                                   np.asarray(v) / scale, rtol=0, atol=5e-6)
    assert float(jnp.max(jnp.abs(g_pc[4]))) == 0.0  # IFT: X carries no grad


def test_matinv_bf16_impl(rng):
    """The AMP-analogue opt-in impl ('matinv_bf16', PERF.md r2): bf16
    inverse-operator matmuls must stay within half-precision tolerance of
    the exact solve.  Native bf16 dot is TPU-only — on backends without it
    the impl-dispatch path is still exercised and the numerics are checked
    via bf16-rounding emulation."""
    from cnn_pde_tpu.ops.tridiag import (set_default_impl, tridiag_solve,
                                         tridiag_inverse_operator,
                                         tridiag_solve_with_operator)

    N = 32
    b = jnp.asarray(2.0 + rng.random((8, N)).astype(np.float32))
    a = jnp.asarray(-rng.random((8, N)).astype(np.float32) * 0.5)
    c = jnp.asarray(-rng.random((8, N)).astype(np.float32) * 0.5)
    d = jnp.asarray(rng.random((64, 8, N)).astype(np.float32))
    x_ref = tridiag_solve(a, b, c, d)

    # emulated operator rounding (runs everywhere): X -> bf16 -> f32
    X = tridiag_inverse_operator(a, b, c)
    X_rounded = X.astype(jnp.bfloat16).astype(jnp.float32)
    x_emu = tridiag_solve_with_operator(a, b, c, d, X_rounded)
    rel = float(jnp.max(jnp.abs(x_emu - x_ref)) / jnp.max(jnp.abs(x_ref)))
    assert rel < 0.02, rel

    # the native impl (bf16 x bf16 dot) where the backend supports it
    prev = set_default_impl("matinv_bf16")
    try:
        x_bf = tridiag_solve(a, b, c, d)
        rel = float(jnp.max(jnp.abs(x_bf - x_ref)) / jnp.max(jnp.abs(x_ref)))
        assert rel < 0.02, rel
    except Exception as e:  # CPU backend: BF16 x BF16 dot unsupported
        if "BF16" not in str(e):
            raise
    finally:
        set_default_impl(prev)
