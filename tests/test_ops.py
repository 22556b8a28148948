"""Tests for smoothing (K6), stencils (K7/K8), ADI sweeps (K4/K5) vs torch-free
numpy oracles and (where cheap) torch CPU as an independent oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.ops import ftcs_evolve, laplacian_step, smooth3, sweep_x, sweep_y


def test_smooth3_matches_torch_conv1d(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.standard_normal((6, 28)).astype(np.float32)
    out = np.asarray(smooth3(jnp.asarray(x), axis=-1))

    xt = torch.from_numpy(x)
    xp = F.pad(xt, (1, 1), mode="replicate")
    kernel = torch.ones(1, 1, 3) / 3
    ref = F.conv1d(xp.unsqueeze(1), kernel, padding=0).squeeze(1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_ftcs_frozen_boundary_semantics(rng):
    """Reproduce the reference's one-time reflect pad (emotion_recognition.py:85):
    boundary ring must stay at its initial reflected values."""
    B, H, W = 2, 8, 8
    u = rng.standard_normal((B, H, W)).astype(np.float32)
    alpha = rng.standard_normal((H, W)).astype(np.float32) * 0.01
    beta = rng.standard_normal((H, W)).astype(np.float32) * 0.01

    # numpy oracle: literal reference semantics
    up = np.pad(u, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    for _ in range(5):
        ui = up[:, 1:-1, 1:-1]
        uxx = up[:, 2:, 1:-1] - 2 * ui + up[:, :-2, 1:-1]
        uyy = up[:, 1:-1, 2:] - 2 * ui + up[:, 1:-1, :-2]
        up[:, 1:-1, 1:-1] = ui + alpha * uxx + beta * uyy
    ref = up[:, 1:-1, 1:-1]

    out = np.asarray(ftcs_evolve(jnp.asarray(u), jnp.asarray(alpha),
                                 jnp.asarray(beta), nt=5))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_laplacian_step_matches_torch_conv2d(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    B, C, H, W = 2, 3, 16, 16
    u = rng.standard_normal((B, C, H, W)).astype(np.float32)
    coeff = np.array([0.05, 0.1, 0.02], dtype=np.float32)
    dt = 0.01

    out = np.asarray(laplacian_step(jnp.asarray(u), jnp.asarray(coeff), dt))

    k = torch.tensor([[0.0, 1, 0], [1, -4, 1], [0, 1, 0]]).view(1, 1, 3, 3)
    ut = torch.from_numpy(u)
    ref = torch.zeros_like(ut)
    for c in range(C):
        lap = F.conv2d(ut[:, c : c + 1], k, padding=1)
        ref[:, c : c + 1] = ut[:, c : c + 1] + coeff[c] * dt * lap
    # float32 accumulation order differs between XLA and torch convs
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-5, atol=1e-4)


def _sweep_oracle_np(u, field, dt, dx, smooth, eps):
    """Numpy oracle mirroring diffuse_x_vectorized (mnist_test.py:67-98):
    expand field over batch, optional 3-tap smooth, tridiag with Neumann b-mods,
    eps'd Thomas, all in float64."""
    B, H, W = u.shape
    u_flat = u.reshape(B * H, W).astype(np.float64)
    f = np.broadcast_to(field, (B, H, W)).reshape(B * H, W).astype(np.float64)
    if smooth:
        fp = np.pad(f, ((0, 0), (1, 1)), mode="edge")
        f = (fp[:, :-2] + fp[:, 1:-1] + fp[:, 2:]) / 3.0
    r = f * dt / dx**2
    a = -r
    c = -r
    b = 1 + 2 * r
    b[:, 0] = 1 + r[:, 0]
    b[:, -1] = 1 + r[:, -1]
    n = W
    cs = np.zeros_like(u_flat)
    ds = np.zeros_like(u_flat)
    cs[:, 0] = c[:, 0] / (b[:, 0] + eps)
    ds[:, 0] = u_flat[:, 0] / (b[:, 0] + eps)
    for i in range(1, n):
        denom = b[:, i] - a[:, i] * cs[:, i - 1] + eps
        if i < n - 1:
            cs[:, i] = c[:, i] / denom
        ds[:, i] = (u_flat[:, i] - a[:, i] * ds[:, i - 1]) / denom
    x = np.zeros_like(u_flat)
    x[:, -1] = ds[:, -1]
    for i in range(n - 2, -1, -1):
        x[:, i] = ds[:, i] - cs[:, i] * x[:, i + 1]
    return x.reshape(B, H, W)


@pytest.mark.parametrize("smooth", [True, False])
def test_sweep_x_parity(rng, smooth):
    B, H, W = 4, 12, 28
    u = rng.standard_normal((B, H, W)).astype(np.float32)
    alpha = (rng.random((H, W)).astype(np.float32) * 2 + 0.1)
    dt, dx, eps = 0.0005, 1.0, 1e-6

    ref = _sweep_oracle_np(u, alpha, dt, dx, smooth, eps)
    out = np.asarray(
        sweep_x(jnp.asarray(u), jnp.asarray(alpha), dt, dx, smooth=smooth, eps=eps)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_sweep_y_is_transposed_sweep_x(rng):
    B, H, W = 3, 16, 12
    u = rng.standard_normal((B, H, W)).astype(np.float32)
    beta = (rng.random((H, W)).astype(np.float32) + 0.2)
    dt, dy, eps = 0.001, 1.0, 1e-6

    # oracle: transpose → x-sweep with transposed field → transpose back
    ref = _sweep_oracle_np(
        np.swapaxes(u, 1, 2), beta.T, dt, dy, True, eps
    )
    ref = np.swapaxes(ref, 1, 2)
    out = np.asarray(
        sweep_y(jnp.asarray(u), jnp.asarray(beta), dt, dy, smooth=True, eps=eps)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_sweep_grad_flows(rng):
    B, H, W = 2, 8, 8
    u = jnp.asarray(rng.standard_normal((B, H, W)).astype(np.float32))
    alpha = jnp.asarray(rng.random((H, W)).astype(np.float32) + 0.5)

    def loss(alpha):
        return jnp.sum(sweep_x(u, alpha, 0.001, 1.0, smooth=True, eps=1e-6) ** 2)

    g = jax.grad(loss)(alpha)
    assert g.shape == alpha.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
