"""Gradient parity vs torch autograd (SURVEY.md §7 hard-part #1).

The reference gets its gradients by autograd-unrolling the eps'd Thomas
recurrence (mnist_test.py:304).  Our solver instead uses the analytic adjoint
(transposed-system solve).  These must agree: here a *freshly written* minimal
torch implementation of the same sweep math (not a copy of the reference)
provides the unrolled-autograd oracle, and we compare gradients w.r.t. the
coefficient fields and the input through a full multi-step Strang evolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.pde import GrayscaleDiffusion

torch = pytest.importorskip("torch")


def torch_thomas_eps(a, b, c, d, eps):
    """Unrolled eps'd Thomas in torch (autograd-friendly, list-based)."""
    n = d.shape[-1]
    cs = [c[:, 0] / (b[:, 0] + eps)]
    ds = [d[:, 0] / (b[:, 0] + eps)]
    for i in range(1, n):
        denom = b[:, i] - a[:, i] * cs[i - 1] + eps
        cs.append(c[:, i] / denom)
        ds.append((d[:, i] - a[:, i] * ds[i - 1]) / denom)
    xs = [None] * n
    xs[-1] = ds[-1]
    for i in range(n - 2, -1, -1):
        xs[i] = ds[i] - cs[i] * xs[i + 1]
    return torch.stack(xs, dim=1)


def torch_smooth3(f):
    fp = torch.cat([f[:, :1], f, f[:, -1:]], dim=1)
    return (fp[:, :-2] + fp[:, 1:-1] + fp[:, 2:]) / 3.0


def torch_sweep_x(u, alpha, dt, dx, eps):
    B, H, W = u.shape
    lines = u.reshape(B * H, W)
    field = alpha.unsqueeze(0).expand(B, -1, -1).reshape(B * H, W)
    r = torch_smooth3(field) * dt / dx**2
    a = -r
    c = -r
    b = 1 + 2 * r
    b = torch.cat([1 + r[:, :1], b[:, 1:-1], 1 + r[:, -1:]], dim=1)
    return torch_thomas_eps(a, b, c, lines, eps).reshape(B, H, W)


def torch_sweep_y(u, beta, dt, dy, eps):
    out = torch_sweep_x(u.transpose(1, 2), beta.t(), dt, dy, eps)
    return out.transpose(1, 2)


def torch_grayscale_forward(u, alpha_base, beta_base, alpha_tc, beta_tc,
                            dt, dx, dy, num_steps, eps=1e-6):
    x = u[:, 0]
    t = 0.0
    for _ in range(num_steps):
        alpha = torch.clamp(alpha_base + alpha_tc * t, min=eps)
        x = torch_sweep_x(x, alpha, dt / 2, dx, eps)
        t += dt / 2
        beta = torch.clamp(beta_base + beta_tc * t, min=eps)
        x = torch_sweep_y(x, beta, dt, dy, eps)
        t += dt / 2
        alpha = torch.clamp(alpha_base + alpha_tc * t, min=eps)
        x = torch_sweep_x(x, alpha, dt / 2, dx, eps)
    return x.unsqueeze(1)


def test_full_layer_gradient_parity(rng, key):
    H = W = 8
    steps = 3
    dt = 0.01
    layer = GrayscaleDiffusion(size=H, dt=dt, num_steps=steps, init_value=2.0)
    params, state = layer.init(key)
    params["alpha_base"] = params["alpha_base"] + jnp.asarray(
        rng.standard_normal((H, W)).astype(np.float32) * 0.3)
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((H, W)).astype(np.float32) * 0.2)
    params["beta_time_coeff"] = jnp.asarray(
        rng.standard_normal((H, W)).astype(np.float32) * 0.2)
    u = rng.random((4, 1, H, W)).astype(np.float32)
    # a non-trivial cotangent via sum of squares
    gw = rng.random((4, 1, H, W)).astype(np.float32)

    def loss_jax(params, u):
        out, _ = layer(params, state, u)
        return jnp.sum(out * jnp.asarray(gw))

    g_jax = jax.grad(loss_jax, argnums=(0, 1))(params, jnp.asarray(u))

    ab = torch.tensor(np.asarray(params["alpha_base"], np.float64),
                      requires_grad=True)
    bb = torch.tensor(np.asarray(params["beta_base"], np.float64),
                      requires_grad=True)
    at = torch.tensor(np.asarray(params["alpha_time_coeff"], np.float64),
                      requires_grad=True)
    bt = torch.tensor(np.asarray(params["beta_time_coeff"], np.float64),
                      requires_grad=True)
    ut = torch.tensor(u.astype(np.float64), requires_grad=True)
    out = torch_grayscale_forward(ut, ab, bb, at, bt, dt, 1.0, 1.0, steps)
    (out * torch.tensor(gw.astype(np.float64))).sum().backward()

    pairs = [
        ("alpha_base", g_jax[0]["alpha_base"], ab.grad),
        ("beta_base", g_jax[0]["beta_base"], bb.grad),
        ("alpha_time_coeff", g_jax[0]["alpha_time_coeff"], at.grad),
        ("beta_time_coeff", g_jax[0]["beta_time_coeff"], bt.grad),
        ("input", g_jax[1], ut.grad),
    ]
    for name, gj, gt in pairs:
        gj = np.asarray(gj)
        gt = gt.numpy()
        scale = max(np.abs(gt).max(), 1e-8)
        np.testing.assert_allclose(
            gj, gt, rtol=5e-4, atol=5e-5 * scale,
            err_msg=f"analytic-adjoint grad mismatch vs torch unrolled "
                    f"autograd for {name}")
