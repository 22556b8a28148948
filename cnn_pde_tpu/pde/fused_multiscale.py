"""Lockstep-merged multi-branch ADI evolution.

The MultiScaleExtractor (cifar10.py:248-282) runs three independent Strang
diffusion branches sequentially — 17 step-triples of sequential solver work
per forward.  The branches only differ in (dt, num_steps, dx, dy) and their
coefficient fields, so here all K branches evolve in LOCKSTEP over
max(num_steps) iterations on stacked (K, B, C, H, W) state: 8 step-triples
instead of 17, with exhausted branches masked to exact identity steps
(a=c=0, b=1, mixing=I — no eps perturbation, so activations match the
sequential path bit-for-bit on active steps).

Parameter layout is untouched (per-branch pde1/pde2/pde3 dicts); this is a
pure execution-strategy change, selected by MultiScaleExtractor(fused=True).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.tridiag import tridiag_solve

__all__ = ["fused_multiscale_evolve"]


def _branch_time_tables(dts, num_steps_list, max_steps):
    """(K, max_steps, 3) float64-accumulated substep times + (K, max_steps)
    active mask."""
    K = len(dts)
    ts = np.zeros((K, max_steps, 3), np.float64)
    active = np.zeros((K, max_steps), np.float32)
    for k, (dt, S) in enumerate(zip(dts, num_steps_list)):
        t = 0.0
        for s in range(S):
            ts[k, s, 0] = t
            t += dt / 2
            ts[k, s, 1] = t
            t += dt / 2
            ts[k, s, 2] = t
            active[k, s] = 1.0
    return jnp.asarray(ts, jnp.float32), jnp.asarray(active)


def _masked_sweep(u, coeff, dtfac, active, eps):
    """Implicit sweep along the last axis on (K, B, C, H, N) with per-branch
    (K, 1, C, H, N) coefficient fields; inactive branches get exact identity
    systems."""
    r = coeff * dtfac  # (K, 1, C, H, N)
    r = r * active     # active: (K, 1, 1, 1, 1)
    a = -r
    c = -r
    b = 1.0 + 2.0 * r
    b = b.at[..., 0].set(1.0 + r[..., 0])
    b = b.at[..., -1].set(1.0 + r[..., -1])
    b = b + eps * active  # reference eps only on live systems
    return tridiag_solve(a, b, c, u)


def fused_multiscale_evolve(u, branch_params, *, dts, steps_list, dxs, dys,
                            eps=1e-6, clamp_max=10.0):
    """u: (B, C, H, W); branch_params: list of K param dicts with
    alpha_base/beta_base/alpha_time_coeff/beta_time_coeff (C, H, W) and
    channel_mixing (C, C).  Returns (K, B, C, H, W)."""
    K = len(branch_params)
    B, C, H, W = u.shape
    max_steps = max(steps_list)
    ts, active = _branch_time_tables(dts, steps_list, max_steps)

    stack = lambda name: jnp.stack([p[name] for p in branch_params])
    ab = stack("alpha_base")[:, None]        # (K, 1, C, H, W)
    at = stack("alpha_time_coeff")[:, None]
    bb = stack("beta_base")[:, None]
    bt = stack("beta_time_coeff")[:, None]
    mix = stack("channel_mixing")            # (K, C, C)
    eye = jnp.eye(C, dtype=mix.dtype)

    dtfac_x = jnp.asarray([dt / 2 / dx**2 for dt, dx in zip(dts, dxs)],
                          jnp.float32).reshape(K, 1, 1, 1, 1)
    dtfac_y = jnp.asarray([dt / dy**2 for dt, dy in zip(dts, dys)],
                          jnp.float32).reshape(K, 1, 1, 1, 1)

    U = jnp.broadcast_to(u[None], (K, B, C, H, W))

    def coeff(base, tc, t):
        # t: (K, 1) -> (K, 1, 1, 1, 1)
        return jnp.clip(base + tc * t[:, :, None, None, None], eps, clamp_max)

    def step(U, inputs):
        t3, act = inputs                     # (K, 3), (K,)
        act5 = act.reshape(K, 1, 1, 1, 1)
        # channel mixing (identity for exhausted branches)
        mix_eff = act[:, None, None] * mix + (1 - act[:, None, None]) * eye
        # broadcast multiply-reduce instead of a degenerate C=3 einsum —
        # exact f32, no whole-tensor layout transposes (see diffusion._mix)
        U = jnp.sum(mix_eff[:, None, :, :, None, None] *
                    U[:, :, None, :, :, :], axis=3)
        # x (dt/2)
        alpha = coeff(ab, at, t3[:, :1])
        U = _masked_sweep(U, alpha, dtfac_x, act5, eps)
        # y (dt): transpose H/W
        beta = coeff(bb, bt, t3[:, 1:2])
        U_t = jnp.swapaxes(U, -1, -2)
        beta_t = jnp.swapaxes(beta, -1, -2)
        U_t = _masked_sweep(U_t, beta_t, dtfac_y, act5, eps)
        U = jnp.swapaxes(U_t, -1, -2)
        # x (dt/2)
        alpha = coeff(ab, at, t3[:, 2:3])
        U = _masked_sweep(U, alpha, dtfac_x, act5, eps)
        return U, None

    U, _ = lax.scan(step, U, (jnp.swapaxes(ts, 0, 1),
                              jnp.swapaxes(active, 0, 1)))
    return U
