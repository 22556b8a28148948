"""P10 — the Tiny-ImageNet residual diffusion front-end
(tiny_imagenet.py:14-233).

Per step: clamp α to [eps, 0.15] (tiny_imagenet.py:40), per-channel scaling
u·s_c (:43), conv-Laplacian explicit step (ops.stencil.laplacian_step, :46),
then a damped residual update u ← u + 0.1·(u_new − u) (:49).

``beta_base`` exists but is never read in the reference forward — kept as a
(trainable, gradient-zero) parameter for state-dict parity.

The reference also ships an ADI implicit path that is dead code
(use_implicit=False at tiny_imagenet.py:243; SURVEY.md §2.1 K9).  Here it is a
*working* option: ``use_implicit=True`` runs an x-then-y implicit half-step
pair with scalar per-channel coefficients via the shared tridiagonal engine.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..nn.core import Module
from ..ops.adi import sweep_x, sweep_y
from ..ops.stencil import laplacian_step
from .linearize import linearized_apply

__all__ = ["ResidualDiffusion"]


class ResidualDiffusion(Module):
    def __init__(self, size=64, channels=3, dt=0.01, num_steps=1,
                 use_implicit=False, eps=1e-6, max_coeff=0.15):
        self.size = size
        self.channels = channels
        self.dt = dt
        self.num_steps = num_steps
        self.use_implicit = use_implicit
        self.eps = eps
        self.max_coeff = max_coeff

    def init(self, key):
        C = self.channels
        params = {
            "alpha_base": jnp.full((C,), 0.05, jnp.float32),
            "beta_base": jnp.full((C,), 0.05, jnp.float32),
            "channel_scaling": jnp.ones((C,), jnp.float32),
        }
        return params, {}

    def apply(self, params, state, u, ctx):
        lin = linearized_apply(self, params, state, u, ctx)
        if lin is not None:
            return lin, state
        for _ in range(self.num_steps):
            alpha_eff = jnp.clip(params["alpha_base"], self.eps, self.max_coeff)
            u_scaled = u * params["channel_scaling"][None, :, None, None]
            if self.use_implicit:
                beta_eff = jnp.clip(params["beta_base"], self.eps, self.max_coeff)
                H, W = u.shape[-2:]
                af = jnp.broadcast_to(alpha_eff[:, None, None], (self.channels, H, W))
                bf = jnp.broadcast_to(beta_eff[:, None, None], (self.channels, H, W))
                u_new = sweep_x(u_scaled, af, self.dt / 2, 1.0,
                                smooth=False, eps=self.eps)
                u_new = sweep_y(u_new, bf, self.dt / 2, 1.0,
                                smooth=False, eps=self.eps)
            else:
                u_new = laplacian_step(u_scaled, alpha_eff, self.dt)
            u = u + 0.1 * (u_new - u)
        return u, state
