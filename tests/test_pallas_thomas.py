"""Pallas fused Thomas kernel tests (interpret mode on CPU; the real kernel
was validated bit-exact vs scan on TPU v5e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.ops.pallas_thomas import pallas_tridiag_solve
from cnn_pde_tpu.ops.tridiag import tridiag_solve_scan


def _system(rng, batch, n):
    a = (rng.standard_normal((batch, n)) * 0.3).astype(np.float32)
    c = (rng.standard_normal((batch, n)) * 0.3).astype(np.float32)
    b = (2.0 + np.abs(a) + np.abs(c)).astype(np.float32)
    d = rng.standard_normal((batch, n)).astype(np.float32)
    return a, b, c, d


@pytest.mark.parametrize("batch,n", [(8, 16), (700, 28)])
def test_pallas_interpret_matches_scan(rng, batch, n):
    a, b, c, d = _system(rng, batch, n)
    x_ref = np.asarray(tridiag_solve_scan(a, b, c, d))
    x_pal = np.asarray(pallas_tridiag_solve(a, b, c, d, True))
    np.testing.assert_allclose(x_pal, x_ref, rtol=1e-6, atol=1e-7)


def test_pallas_vjp_matches_scan(rng):
    a, b, c, d = _system(rng, 16, 16)

    g1 = jax.grad(lambda d: jnp.sum(
        jnp.sin(pallas_tridiag_solve(a, b, c, d, True))))(jnp.asarray(d))
    g2 = jax.grad(lambda d: jnp.sum(
        jnp.sin(tridiag_solve_scan(a, b, c, jnp.asarray(d)))))(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_pallas_broadcast_coeffs(rng):
    a, b, c, _ = _system(rng, 1, 24)
    a, b, c = a[0], b[0], c[0]
    d = rng.standard_normal((32, 24)).astype(np.float32)
    x = np.asarray(pallas_tridiag_solve(a, b, c, d, True))
    x_ref = np.asarray(tridiag_solve_scan(
        np.broadcast_to(a, d.shape).copy(), np.broadcast_to(b, d.shape).copy(),
        np.broadcast_to(c, d.shape).copy(), d))
    np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-7)
