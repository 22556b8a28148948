"""Fused whole-layer kernel for the channel diffusion variants (P4/P5):
one launch per MixedChannelDiffusion forward — channel mixing, per-channel
coefficient fields with [eps, clamp_max] clamping, Strang or Lie splitting,
all steps on a VMEM-resident (TILE_B, C, H, W) tile.

No smoothing (parity: the CIFAR variants pass raw coefficients).  Forward
only — the training backward follows the grayscale template
(pallas_fused_adi_vjp) in a later round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused_adi import _pcr_rows

__all__ = ["fused_channel_diffusion_fwd"]


def _abc_nosmooth(field, dtfac, eps, n):
    """The (a, b, c) sweep system for a raw (unsmoothed) coefficient field:
    a=c=-r, b=1+2r with Neumann edge rows 1+r, plus the reference eps on b.
    Shared by the forward sweep and the VJP's transposed solve so the two
    can never desynchronize."""
    r = field * dtfac
    idx = lax.broadcasted_iota(jnp.int32, r.shape, r.ndim - 1)
    b = jnp.where((idx == 0) | (idx == n - 1), 1.0 + r, 1.0 + 2.0 * r) + eps
    a = -r
    a = jnp.where(idx == 0, 0.0, a)
    c = -r
    c = jnp.where(idx == n - 1, 0.0, c)
    return a, b, c


def _sweep_nosmooth(u, field, dtfac, eps, n):
    """Implicit sweep along the last axis; field (C, H, n) broadcasts over the
    tile batch of u (TILE_B, C, H, n)."""
    a, b, c = _abc_nosmooth(field, dtfac, eps, n)
    return _pcr_rows(a, b, c, u, n)


def _make_kernel(*, C, H, W, dt, dx, dy, eps, cmax, num_steps, splitting):
    dtf_x = dt / 2 / (dx * dx)
    dtf_y = (dt if splitting == "strang" else dt / 2) / (dy * dy)

    def kernel(ts_ref, u_ref, ab_ref, atc_ref, bb_ref, btc_ref, mix_ref,
               out_ref):
        ab = ab_ref[...]          # (C, H, W)
        atc = atc_ref[...]
        bb = bb_ref[...]
        btc = btc_ref[...]

        def coeff(base, tc, t):
            return jnp.clip(base + tc * t, eps, cmax)

        def step(s, u):
            # channel mixing: u[c] = Σ_k mix[c,k]·u[k] (unrolled, C is tiny)
            mixed = [
                sum(mix_ref[c, k] * u[:, k] for k in range(C))
                for c in range(C)
            ]
            u = jnp.stack(mixed, axis=1)
            alpha = coeff(ab, atc, ts_ref[s, 0])
            u = _sweep_nosmooth(u, alpha, dtf_x, eps, W)
            beta = coeff(bb, btc, ts_ref[s, 1])
            u_t = jnp.swapaxes(u, -1, -2)
            u_t = _sweep_nosmooth(u_t, jnp.swapaxes(beta, -1, -2), dtf_y,
                                  eps, H)
            u = jnp.swapaxes(u_t, -1, -2)
            if splitting == "strang":
                alpha = coeff(ab, atc, ts_ref[s, 2])
                u = _sweep_nosmooth(u, alpha, dtf_x, eps, W)
            return u

        out_ref[...] = lax.fori_loop(0, num_steps, step, u_ref[...])

    return kernel


def fused_channel_diffusion_fwd(u, alpha_base, alpha_tc, beta_base, beta_tc,
                                mixing, *, dt, dx, dy, num_steps, ts,
                                splitting="strang", eps=1e-6, cmax=10.0,
                                tile_b=64, interpret=False):
    """u: (B, C, H, W); fields (C, H, W); mixing (C, C); ts (num_steps, 3)."""
    B, C, H, W = u.shape
    B_pad = -(-B // tile_b) * tile_b
    if B_pad != B:
        u = jnp.concatenate(
            [u, jnp.zeros((B_pad - B, C, H, W), u.dtype)], axis=0)
    ts = jnp.asarray(np.asarray(ts, np.float32))
    kernel = _make_kernel(C=C, H=H, W=W, dt=dt, dx=dx, dy=dy, eps=eps,
                          cmax=cmax, num_steps=num_steps, splitting=splitting)
    field = pl.BlockSpec((C, H, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((tile_b, C, H, W), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B_pad // tile_b,),
        in_specs=[
            pl.BlockSpec((num_steps, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            tile, field, field, field, field,
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B_pad, C, H, W), u.dtype),
        interpret=interpret,
    )(ts, u, alpha_base, alpha_tc, beta_base, beta_tc, mixing)
    return out[:B]
