"""Float64 numpy oracle re-executing the reference's PDE math.

This is a test oracle written from the structural analysis in SURVEY.md (with
file:line citations), NOT a copy of the reference code: it exists so the JAX
layers can be validated against an independent high-precision execution of the
same scheme (per-step activation parity ≤ 1e-5, BASELINE.md).
"""

from __future__ import annotations

import numpy as np


def thomas_np(a, b, c, d, eps):
    """Eps-in-denominator Thomas recurrence (mnist_test.py:151-198), (R, N)."""
    n = d.shape[-1]
    cs = np.zeros_like(d)
    ds = np.zeros_like(d)
    cs[:, 0] = c[:, 0] / (b[:, 0] + eps)
    ds[:, 0] = d[:, 0] / (b[:, 0] + eps)
    for i in range(1, n):
        denom = b[:, i] - a[:, i] * cs[:, i - 1] + eps
        if i < n - 1:
            cs[:, i] = c[:, i] / denom
        ds[:, i] = (d[:, i] - a[:, i] * ds[:, i - 1]) / denom
    x = np.zeros_like(d)
    x[:, -1] = ds[:, -1]
    for i in range(n - 2, -1, -1):
        x[:, i] = ds[:, i] - cs[:, i] * x[:, i + 1]
    return x


def smooth3_np(f):
    """3-tap replicate moving average along last axis (mnist_test.py:135-149)."""
    fp = np.pad(f, [(0, 0)] * (f.ndim - 1) + [(1, 1)], mode="edge")
    return (fp[..., :-2] + fp[..., 1:-1] + fp[..., 2:]) / 3.0


def sweep_lines_np(lines, field, dt, dx, smooth, eps):
    """One implicit sweep over (R, N) lines with (R, N) coefficient field
    (mnist_test.py:67-98: a=-r, b=1+2r with Neumann b-mods, c=-r)."""
    f = smooth3_np(field) if smooth else field
    r = f * dt / dx**2
    a = -r
    c = -r
    b = 1 + 2 * r
    b[:, 0] = 1 + r[:, 0]
    b[:, -1] = 1 + r[:, -1]
    return thomas_np(a, b, c, lines, eps)


def sweep_x_np(u, alpha, dt, dx, smooth, eps):
    """u: (B, H, W), alpha: (H, W) broadcast over batch."""
    B, H, W = u.shape
    lines = u.reshape(B * H, W)
    field = np.broadcast_to(alpha, (B, H, W)).reshape(B * H, W).copy()
    return sweep_lines_np(lines, field, dt, dx, smooth, eps).reshape(B, H, W)


def sweep_y_np(u, beta, dt, dy, smooth, eps):
    """Transpose → x-sweep → transpose back (mnist_test.py:100-133)."""
    out = sweep_x_np(np.swapaxes(u, 1, 2), beta.T, dt, dy, smooth, eps)
    return np.swapaxes(out, 1, 2)


def coeff_at_np(base, time_coeff, t, eps, cmax=None):
    c = base + time_coeff * t
    return np.clip(c, eps, cmax) if cmax is not None else np.maximum(c, eps)


def grayscale_forward_np(u, params, dt, dx, dy, num_steps, eps=1e-6):
    """P1/P2 Strang scheme with exact time bookkeeping (mnist_test.py:44-65)."""
    x = u[:, 0].astype(np.float64)
    ab = params["alpha_base"].astype(np.float64)
    at = params["alpha_time_coeff"].astype(np.float64)
    bb = params["beta_base"].astype(np.float64)
    bt = params["beta_time_coeff"].astype(np.float64)
    t = 0.0
    for _ in range(num_steps):
        x = sweep_x_np(x, coeff_at_np(ab, at, t, eps), dt / 2, dx, True, eps)
        t += dt / 2
        x = sweep_y_np(x, coeff_at_np(bb, bt, t, eps), dt, dy, True, eps)
        t += dt / 2
        x = sweep_x_np(x, coeff_at_np(ab, at, t, eps), dt / 2, dx, True, eps)
    return x[:, None]


def svhn_forward_np(u, params, dt, dx, num_steps, eps=1e-6):
    """P3 scheme: per-channel Strang + coupling + sigmoid skip (SVHN.py:49-86)."""
    u = u.astype(np.float64)
    u0 = u.copy()
    ab = params["alpha_base"].astype(np.float64)
    at = params["alpha_time_coeff"].astype(np.float64)
    bb = params["beta_base"].astype(np.float64)
    bt = params["beta_time_coeff"].astype(np.float64)
    coupling = params["channel_coupling"].astype(np.float64)
    C = u.shape[1]
    t = 0.0
    for _ in range(num_steps):
        alpha = coeff_at_np(ab, at, t, eps)
        u = np.stack([sweep_x_np(u[:, c], alpha[c], dt / 2, dx, True, eps)
                      for c in range(C)], 1)
        t += dt / 2
        beta = coeff_at_np(bb, bt, t, eps)
        u = np.stack([sweep_y_np(u[:, c], beta[c], dt, dx, True, eps)
                      for c in range(C)], 1)
        t += dt / 2
        alpha = coeff_at_np(ab, at, t, eps)
        u = np.stack([sweep_x_np(u[:, c], alpha[c], dt / 2, dx, True, eps)
                      for c in range(C)], 1)
        # coupling: pixels (B·H·W, C) @ couplingᵀ (SVHN.py:78-86)
        B, C_, H, W = u.shape
        pix = u.transpose(0, 2, 3, 1).reshape(-1, C_)
        u = (pix @ coupling.T).reshape(B, H, W, C_).transpose(0, 3, 1, 2)
    s = 1.0 / (1.0 + np.exp(-params["skip_weight"].astype(np.float64)))
    return s * u0 + (1 - s) * u


def mixed_forward_np(u, params, dt, dx, dy, num_steps, splitting, eps=1e-6,
                     cmax=10.0):
    """P4/P5: channel mixing before sweeps, no smoothing (cifar10.py:74-114,
    cifar_2version.py:70-104)."""
    u = u.astype(np.float64)
    ab = params["alpha_base"].astype(np.float64)
    at = params["alpha_time_coeff"].astype(np.float64)
    bb = params["beta_base"].astype(np.float64)
    bt = params["beta_time_coeff"].astype(np.float64)
    mixing = params["channel_mixing"].astype(np.float64)
    B, C, H, W = u.shape
    t = 0.0
    for _ in range(num_steps):
        u = np.einsum("kc,bchw->bkhw", mixing, u)
        alpha = coeff_at_np(ab, at, t, eps, cmax)
        u = np.stack([sweep_x_np(u[:, c], alpha[c], dt / 2, dx, False, eps)
                      for c in range(C)], 1)
        t += dt / 2
        beta = coeff_at_np(bb, bt, t, eps, cmax)
        dt_y = dt if splitting == "strang" else dt / 2
        u = np.stack([sweep_y_np(u[:, c], beta[c], dt_y, dy, False, eps)
                      for c in range(C)], 1)
        t += dt / 2
        if splitting == "strang":
            alpha = coeff_at_np(ab, at, t, eps, cmax)
            u = np.stack([sweep_x_np(u[:, c], alpha[c], dt / 2, dx, False, eps)
                          for c in range(C)], 1)
    return u


def fourier_ftcs_forward_np(u, params, Nx, Ny, Lx, Ly, T, dt):
    """P9: Fourier coefficient grids + frozen-ring FTCS
    (emotion_recognition.py:56-97)."""
    dx, dy = Lx / Nx, Ly / Ny
    nt = int(T / dt)
    x = np.linspace(0, Lx, Nx)
    y = np.linspace(0, Ly, Ny)
    yy, xx = np.meshgrid(y, x, indexing="ij")
    p = {k: np.float64(v) for k, v in params.items()}
    alpha = 0.5 * dt * (p["alpha_w1"] + p["alpha_w2"] * np.sin(2 * np.pi * yy)
                        + p["alpha_w3"] * np.sin(4 * np.pi * yy)) / dx**2
    beta = dt * (p["beta_w1"] + p["beta_w2"] * np.cos(2 * np.pi * xx)
                 + p["beta_w3"] * np.cos(4 * np.pi * xx)) / dy**2
    up = np.pad(u[:, 0].astype(np.float64), ((0, 0), (1, 1), (1, 1)), mode="reflect")
    for _ in range(nt):
        ui = up[:, 1:-1, 1:-1]
        uxx = up[:, 2:, 1:-1] - 2 * ui + up[:, :-2, 1:-1]
        uyy = up[:, 1:-1, 2:] - 2 * ui + up[:, 1:-1, :-2]
        up[:, 1:-1, 1:-1] = ui + alpha * uxx + beta * uyy
    return up[:, None, 1:-1, 1:-1]


def residual_forward_np(u, params, dt, num_steps, eps=1e-6, max_coeff=0.15):
    """P10: clamp → channel scale → conv-Laplacian → 0.1·residual
    (tiny_imagenet.py:34-72)."""
    u = u.astype(np.float64)
    alpha = np.clip(params["alpha_base"].astype(np.float64), eps, max_coeff)
    scaling = params["channel_scaling"].astype(np.float64)
    for _ in range(num_steps):
        us = u * scaling[None, :, None, None]
        up = np.pad(us, ((0, 0), (0, 0), (1, 1), (1, 1)))
        lap = (up[:, :, :-2, 1:-1] + up[:, :, 2:, 1:-1]
               + up[:, :, 1:-1, :-2] + up[:, :, 1:-1, 2:]
               - 4 * up[:, :, 1:-1, 1:-1])
        u_new = us + alpha[None, :, None, None] * dt * lap
        u = u + 0.1 * (u_new - u)
    return u
