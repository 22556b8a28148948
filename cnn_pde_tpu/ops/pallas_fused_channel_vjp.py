"""Trainable fused channel diffusion (P4/P5): forward AND backward as single
Pallas kernels — the channel-variant counterpart of pallas_fused_adi_vjp.

Forward: the whole S-step evolution (channel mixing → clamped per-channel
coefficient fields → Strang or Lie ADI sweeps; cifar10.py:74-110 /
cifar_2version.py:80-99 semantics) in one launch, streaming the S per-step
input states to HBM as residuals.

Backward: one kernel walks the steps in reverse.  Per step it recomputes the
intra-step states from the saved step input, then applies the analytic
adjoints in reverse order:
    x/y sweep:  λ = T⁻ᵀ·cot;  grad_field = Σ_batch fold(−λ⊗x_out)·dtfac,
                masked by the TWO-SIDED clamp gate (eps < raw < clamp_max —
                the CIFAR variants clip above at 10, cifar10.py:60-61);
    mixing:     grad_mix[k,c] += Σ cot[:,k]·u_step_in[:,c];
                cot ← mixᵀ·cot.
No smoothing anywhere (parity: raw coefficients in both CIFAR variants).

Numerics match jax.grad through the XLA scan path (tested in interpret mode;
see tests/test_pallas_fused_channel_vjp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused_adi import _pcr_rows
from .pallas_fused_adi_vjp import _grad_r
from .pallas_fused_channel import _abc_nosmooth, _sweep_nosmooth
from .tridiag import _transpose_system

__all__ = ["fused_channel_diffusion"]


def _sweepT_nosmooth(lines, field, dtfac, eps, n):
    """Adjoint solve x = T⁻ᵀ·lines: the SAME system construction as the
    forward sweep (_abc_nosmooth), transposed via the shared shift helper."""
    a, b, c = _abc_nosmooth(field, dtfac, eps, n)
    a_t, b, c_t = _transpose_system(a, b, c)
    return _pcr_rows(a_t, b, c_t, lines, n)


def _make_fwd_kernel(*, C, H, W, dt, dx, dy, eps, cmax, num_steps, splitting):
    dtf_x = dt / 2 / (dx * dx)
    dtf_y = (dt if splitting == "strang" else dt / 2) / (dy * dy)

    def kernel(ts_ref, u_ref, ab_ref, atc_ref, bb_ref, btc_ref, mix_ref,
               out_ref, res_ref):
        ab = ab_ref[...]
        atc = atc_ref[...]
        bb = bb_ref[...]
        btc = btc_ref[...]

        def coeff(base, tc, t):
            return jnp.clip(base + tc * t, eps, cmax)

        def step(s, u):
            res_ref[s] = u
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


def _make_bwd_kernel(*, C, H, W, dt, dx, dy, eps, cmax, num_steps, splitting):
    dtf_x = dt / 2 / (dx * dx)
    dtf_y = (dt if splitting == "strang" else dt / 2) / (dy * dy)

    def kernel(ts_ref, g_ref, res_ref, out_final_ref,
               ab_ref, atc_ref, bb_ref, btc_ref, mix_ref,
               gu_ref, gab_ref, gatc_ref, gbb_ref, gbtc_ref, gm_ref):
        ab = ab_ref[...]
        atc = atc_ref[...]
        bb = bb_ref[...]
        btc = btc_ref[...]
        gab_ref[0] = jnp.zeros_like(ab)
        gatc_ref[0] = jnp.zeros_like(ab)
        gbb_ref[0] = jnp.zeros_like(ab)
        gbtc_ref[0] = jnp.zeros_like(ab)
        for kk in range(C):
            for cc in range(C):
                gm_ref[0, kk, cc] = 0.0

        def clamp_mask(raw, like):
            return ((raw > eps) & (raw < cmax)).astype(like.dtype)

        def x_sweep_adjoint(cot, x_out, t):
            raw = ab + atc * t
            alpha = jnp.clip(raw, eps, cmax)
            lam = _sweepT_nosmooth(cot, alpha, dtf_x, eps, W)
            gr = _grad_r(lam, x_out, W)                 # (B, C, H, W)
            gfield = jnp.sum(gr, axis=0) * dtf_x        # (C, H, W)
            mask = clamp_mask(raw, gfield)
            gab_ref[0] += mask * gfield
            gatc_ref[0] += mask * gfield * t
            return lam

        def y_sweep_adjoint(cot, x_out, t):
            raw = bb + btc * t
            beta = jnp.clip(raw, eps, cmax)
            cot_t = jnp.swapaxes(cot, -1, -2)
            x_out_t = jnp.swapaxes(x_out, -1, -2)
            beta_t = jnp.swapaxes(beta, -1, -2)
            lam_t = _sweepT_nosmooth(cot_t, beta_t, dtf_y, eps, H)
            gr = _grad_r(lam_t, x_out_t, H)
            gfield = jnp.swapaxes(jnp.sum(gr, axis=0) * dtf_y, -1, -2)
            mask = clamp_mask(raw, gfield)
            gbb_ref[0] += mask * gfield
            gbtc_ref[0] += mask * gfield * t
            return jnp.swapaxes(lam_t, -1, -2)

        def coeff(base, tc, t):
            return jnp.clip(base + tc * t, eps, cmax)

        def step_back(k, cot):
            s = num_steps - 1 - k
            u_s = res_ref[s]
            mixed = [
                sum(mix_ref[c, k2] * u_s[:, k2] for k2 in range(C))
                for c in range(C)
            ]
            u_mix = jnp.stack(mixed, axis=1)
            out_s = lax.cond(s == num_steps - 1,
                             lambda: out_final_ref[...],
                             lambda: res_ref[jnp.minimum(s + 1,
                                                         num_steps - 1)])
            alpha0 = coeff(ab, atc, ts_ref[s, 0])
            x1 = _sweep_nosmooth(u_mix, alpha0, dtf_x, eps, W)
            if splitting == "strang":
                beta1 = coeff(bb, btc, ts_ref[s, 1])
                x1_t = jnp.swapaxes(x1, -1, -2)
                x2_t = _sweep_nosmooth(x1_t, jnp.swapaxes(beta1, -1, -2),
                                       dtf_y, eps, H)
                x2 = jnp.swapaxes(x2_t, -1, -2)
                cot = x_sweep_adjoint(cot, out_s, ts_ref[s, 2])
                cot = y_sweep_adjoint(cot, x2, ts_ref[s, 1])
            else:
                cot = y_sweep_adjoint(cot, out_s, ts_ref[s, 1])
            cot = x_sweep_adjoint(cot, x1, ts_ref[s, 0])
            # mixing adjoint: grad_mix[k,c] += Σ cot[:,k]·u_s[:,c];
            # cot ← mixᵀ·cot (static-index scalar accumulation in SMEM —
            # Mosaic-friendly, C is tiny)
            for kk in range(C):
                for cc in range(C):
                    gm_ref[0, kk, cc] += jnp.sum(cot[:, kk] * u_s[:, cc])
            unmixed = [
                sum(mix_ref[k2, c] * cot[:, k2] for k2 in range(C))
                for c in range(C)
            ]
            return jnp.stack(unmixed, axis=1)

        gu_ref[...] = lax.fori_loop(0, num_steps, step_back, g_ref[...])

    return kernel


def _fwd_call(u, ab, atc, bb, btc, mix, *, dt, dx, dy, num_steps, ts,
              splitting, eps, cmax, tile_b, interpret):
    B, C, H, W = u.shape
    B_pad = -(-B // tile_b) * tile_b
    if B_pad != B:
        u = jnp.concatenate(
            [u, jnp.zeros((B_pad - B, C, H, W), u.dtype)], axis=0)
    ts = jnp.asarray(np.asarray(ts, np.float32))
    kernel = _make_fwd_kernel(C=C, H=H, W=W, dt=dt, dx=dx, dy=dy, eps=eps,
                              cmax=cmax, num_steps=num_steps,
                              splitting=splitting)
    field = pl.BlockSpec((C, H, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((tile_b, C, H, W), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out, res = pl.pallas_call(
        kernel,
        grid=(B_pad // tile_b,),
        in_specs=[
            pl.BlockSpec((num_steps, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            tile, field, field, field, field,
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(tile,
                   pl.BlockSpec((num_steps, tile_b, C, H, W),
                                lambda i: (0, i, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B_pad, C, H, W), u.dtype),
                   jax.ShapeDtypeStruct((num_steps, B_pad, C, H, W),
                                        u.dtype)),
        interpret=interpret,
    )(ts, u, ab, atc, bb, btc, mix)
    return out, res, B_pad


def _bwd_call(g, res, out_final, ab, atc, bb, btc, mix, *, dt, dx, dy,
              num_steps, ts, splitting, eps, cmax, tile_b, interpret, B_pad):
    C, H, W = ab.shape
    if g.shape[0] != B_pad:
        g = jnp.concatenate(
            [g, jnp.zeros((B_pad - g.shape[0], C, H, W), g.dtype)], 0)
    ts = jnp.asarray(np.asarray(ts, np.float32))
    kernel = _make_bwd_kernel(C=C, H=H, W=W, dt=dt, dx=dx, dy=dy, eps=eps,
                              cmax=cmax, num_steps=num_steps,
                              splitting=splitting)
    G = B_pad // tile_b
    field_in = pl.BlockSpec((C, H, W), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    field_out = pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((tile_b, C, H, W), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((num_steps, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  tile,
                  pl.BlockSpec((num_steps, tile_b, C, H, W),
                               lambda i: (0, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  tile, field_in, field_in, field_in, field_in,
                  pl.BlockSpec((C, C), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(tile, field_out, field_out, field_out, field_out,
                   pl.BlockSpec((1, C, C), lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((B_pad, C, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, C, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, C, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, C, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, C, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, C, C), g.dtype)),
        interpret=interpret,
    )(ts, g, res, out_final, ab, atc, bb, btc, mix)
    gu, gab, gatc, gbb, gbtc, gm = outs
    return gu, gab.sum(0), gatc.sum(0), gbb.sum(0), gbtc.sum(0), gm.sum(0)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15))
def fused_channel_diffusion(u, ab, atc, bb, btc, mix, dt, dx, dy, num_steps,
                            ts_tuple, splitting="strang", eps=1e-6,
                            cmax=10.0, tile_b=8, interpret=False):
    """Trainable fused channel evolution.  u: (B, C, H, W); fields (C, H, W);
    mix (C, C); ts_tuple: hashable tuple-of-tuples of the (num_steps, 3)
    substep times (static)."""
    out, _, _ = _fwd_call(u, ab, atc, bb, btc, mix, dt=dt, dx=dx, dy=dy,
                          num_steps=num_steps, ts=ts_tuple,
                          splitting=splitting, eps=eps, cmax=cmax,
                          tile_b=tile_b, interpret=interpret)
    return out[: u.shape[0]]


def _vjp_fwd(u, ab, atc, bb, btc, mix, dt, dx, dy, num_steps, ts_tuple,
             splitting, eps, cmax, tile_b, interpret):
    out, res, B_pad = _fwd_call(u, ab, atc, bb, btc, mix, dt=dt, dx=dx,
                                dy=dy, num_steps=num_steps, ts=ts_tuple,
                                splitting=splitting, eps=eps, cmax=cmax,
                                tile_b=tile_b, interpret=interpret)
    return out[: u.shape[0]], (res, out, ab, atc, bb, btc, mix, B_pad,
                               u.shape[0])


def _vjp_bwd(dt, dx, dy, num_steps, ts_tuple, splitting, eps, cmax, tile_b,
             interpret, residuals, g):
    res, out_full, ab, atc, bb, btc, mix, B_pad, B = residuals
    gu, gab, gatc, gbb, gbtc, gm = _bwd_call(
        g, res, out_full, ab, atc, bb, btc, mix, dt=dt, dx=dx, dy=dy,
        num_steps=num_steps, ts=ts_tuple, splitting=splitting, eps=eps,
        cmax=cmax, tile_b=tile_b, interpret=interpret, B_pad=B_pad)
    return gu[:B], gab, gatc, gbb, gbtc, gm


fused_channel_diffusion.defvjp(_vjp_fwd, _vjp_bwd)
