"""P9 — the emotion-recognition FTCS PDE layer with Fourier-parameterized
coefficient fields (emotion_recognition.py:56-97).

Only 6 scalar weights are learnable; the coefficient grids are
    α(y) = 0.5·dt·(w₁ + w₂·sin 2πy + w₃·sin 4πy)/dx²      (applied to u_xx)
    β(x) =     dt·(w₁ + w₂·cos 2πx + w₃·cos 4πx)/dy²      (applied to u_yy)
on a meshgrid(y, x, indexing='ij') — α varies along the first spatial axis.
The explicit loop uses the frozen-reflect-ring FTCS kernel (ops.stencil).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..nn.core import Module
from ..ops.stencil import ftcs_evolve
from .linearize import linearized_apply

__all__ = ["FourierFTCSLayer"]


class FourierFTCSLayer(Module):
    def __init__(self, Nx=48, Ny=48, Lx=1.0, Ly=1.0, T=0.01, dt=0.001):
        self.Nx, self.Ny, self.Lx, self.Ly = Nx, Ny, Lx, Ly
        self.T, self.dt = T, dt
        self.dx = Lx / Nx
        self.dy = Ly / Ny
        self.Nt = int(T / dt)
        # grid buffers (registered buffers at emotion_recognition.py:73-74)
        self.x_grid = jnp.linspace(0.0, Lx, Nx)
        self.y_grid = jnp.linspace(0.0, Ly, Ny)

    def init(self, key):
        params = {
            "alpha_w1": jnp.asarray(0.1, jnp.float32),
            "alpha_w2": jnp.asarray(0.1, jnp.float32),
            "alpha_w3": jnp.asarray(0.1, jnp.float32),
            "beta_w1": jnp.asarray(0.3, jnp.float32),
            "beta_w2": jnp.asarray(0.2, jnp.float32),
            "beta_w3": jnp.asarray(0.2, jnp.float32),
        }
        return params, {}

    def coefficient_grids(self, params):
        yy, xx = jnp.meshgrid(self.y_grid, self.x_grid, indexing="ij")
        two_pi = 2.0 * jnp.pi
        alpha = 0.5 * self.dt * (
            params["alpha_w1"]
            + params["alpha_w2"] * jnp.sin(two_pi * yy)
            + params["alpha_w3"] * jnp.sin(2 * two_pi * yy)
        ) / self.dx**2
        beta = self.dt * (
            params["beta_w1"]
            + params["beta_w2"] * jnp.cos(two_pi * xx)
            + params["beta_w3"] * jnp.cos(2 * two_pi * xx)
        ) / self.dy**2
        return alpha, beta

    def apply(self, params, state, u, ctx):
        lin = linearized_apply(self, params, state, u, ctx)
        if lin is not None:
            return lin, state
        x = u[:, 0]  # (B, Nx, Ny)
        alpha, beta = self.coefficient_grids(params)
        out = ftcs_evolve(x, alpha, beta, self.Nt)
        return out[:, None], state
