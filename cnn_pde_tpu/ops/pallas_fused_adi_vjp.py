"""Trainable fused ADI evolution: forward AND backward as single Pallas
kernels (the round-1 roadmap item "fused-kernel backward").

Forward: the whole S-step Strang evolution in one launch (as
pallas_fused_adi), additionally streaming the S per-step input states to HBM
as residuals (S+1 tensors instead of the XLA path's ~9S intermediates).

Backward: one kernel walks the steps in reverse; for each step it recomputes
the two intra-step states from the saved step input (2 extra solves), then
applies the analytic sweep adjoints:
    λ = T⁻ᵀ·cot_out;  cot_in = λ;
    grad_r = fold(−λ⊗x_out onto the a/b/c structure incl. Neumann rows);
    grad_field = smooth3ᵀ(grad_r·dtfac) summed over the tile batch;
    grad_{α_base} += clampmask·grad_field,  grad_{α_time} += t·clampmask·…
Per-tile partial coefficient grads are summed outside the kernel.

Numerics match jax.grad through the XLA scan path (tested ≤1e-4 relative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused_adi import _pcr_rows, _smooth3_edge, _sweep_rows

__all__ = ["fused_grayscale_diffusion"]


def _sweepT_rows(lines, field2d, dtfac, eps, n):
    """Adjoint solve: x = T⁻ᵀ·lines for the sweep system built from field2d."""
    f = _smooth3_edge(field2d)
    r = f * dtfac
    idx = lax.broadcasted_iota(jnp.int32, r.shape, r.ndim - 1)
    b = jnp.where((idx == 0) | (idx == n - 1), 1.0 + r, 1.0 + 2.0 * r) + eps
    a = -r
    a = jnp.where(idx == 0, 0.0, a)
    c = -r
    c = jnp.where(idx == n - 1, 0.0, c)
    # transpose system: sub'[i] = c[i-1], super'[i] = a[i+1]
    a_t = jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    c_t = jnp.concatenate([a[..., 1:], jnp.zeros_like(a[..., :1])], axis=-1)
    return _pcr_rows(a_t, b, c_t, lines, n)


def _grad_r(lam, x_out, n):
    """grad wrt r (pre-smoothing, post-dtfac) from the sweep adjoint pair:
    interior: 2gb − ga − gc; edge rows use the Neumann-modified b."""
    gb = -lam * x_out
    ga = jnp.concatenate([jnp.zeros_like(x_out[..., :1]),
                          -lam[..., 1:] * x_out[..., :-1]], axis=-1)
    gc = jnp.concatenate([-lam[..., :-1] * x_out[..., 1:],
                          jnp.zeros_like(x_out[..., :1])], axis=-1)
    idx = lax.broadcasted_iota(jnp.int32, x_out.shape, x_out.ndim - 1)
    interior = 2.0 * gb - ga - gc
    left = gb - gc      # j=0: b=1+r, c=-r, a unused
    right = gb - ga     # j=N-1: b=1+r, a=-r, c unused
    return jnp.where(idx == 0, left, jnp.where(idx == n - 1, right, interior))


def _make_fwd_kernel(*, H, W, dt, dx, dy, eps, num_steps):
    def kernel(ts_ref, u_ref, ab_ref, atc_ref, bb_ref, btc_ref,
               out_ref, res_ref):
        ab = ab_ref[...]
        atc = atc_ref[...]
        bb = bb_ref[...]
        btc = btc_ref[...]

        def step(s, u):
            res_ref[s] = u
            alpha = jnp.maximum(ab + atc * ts_ref[s, 0], eps)
            u = _sweep_rows(u, alpha, dt / 2, dx, eps, True, W)
            beta_t = jnp.maximum(bb + btc * ts_ref[s, 1], eps)
            u_t = jnp.swapaxes(u, -1, -2)
            u_t = _sweep_rows(u_t, jnp.swapaxes(beta_t, -1, -2), dt, dy, eps,
                              True, H)
            u = jnp.swapaxes(u_t, -1, -2)
            alpha = jnp.maximum(ab + atc * ts_ref[s, 2], eps)
            return _sweep_rows(u, alpha, dt / 2, dx, eps, True, W)

        out_ref[...] = lax.fori_loop(0, num_steps, step, u_ref[...])

    return kernel


def _make_bwd_kernel(*, H, W, dt, dx, dy, eps, num_steps):
    dtf_x = dt / 2 / (dx * dx)
    dtf_y = dt / (dy * dy)

    def kernel(ts_ref, g_ref, res_ref, out_final_ref,
               ab_ref, atc_ref, bb_ref, btc_ref,
               gu_ref, gab_ref, gatc_ref, gbb_ref, gbtc_ref):
        ab = ab_ref[...]
        atc = atc_ref[...]
        bb = bb_ref[...]
        btc = btc_ref[...]
        gab_ref[0] = jnp.zeros_like(ab)
        gatc_ref[0] = jnp.zeros_like(ab)
        gbb_ref[0] = jnp.zeros_like(ab)
        gbtc_ref[0] = jnp.zeros_like(ab)

        def x_sweep_adjoint(cot, x_out, t):
            """Adjoint of an x-sweep at time t; returns cot wrt sweep input."""
            raw = ab + atc * t
            alpha = jnp.maximum(raw, eps)
            lam = _sweepT_rows(cot, alpha, dtf_x, eps, W)
            gr = _grad_r(lam, x_out, W)               # (B, H, W)
            gr_field = jnp.sum(gr, axis=0) * dtf_x    # (H, W)
            # adjoint of smooth3 with replicate pad: Sᵀ = interior 3-tap avg,
            # edge columns get the pad contribution
            k = jnp.asarray(1.0 / 3.0, gr_field.dtype)
            left = jnp.concatenate([jnp.zeros_like(gr_field[..., :1]),
                                    gr_field[..., :-1]], axis=-1)
            right = jnp.concatenate([gr_field[..., 1:],
                                     jnp.zeros_like(gr_field[..., :1])],
                                    axis=-1)
            gsm = (left + gr_field + right) * k
            # replicate-pad edge columns get an extra 1/3 weight; Mosaic has
            # no scatter-add, so use an iota mask instead of .at[].add
            idxc = lax.broadcasted_iota(jnp.int32, gsm.shape, gsm.ndim - 1)
            gsm = gsm + jnp.where((idxc == 0) | (idxc == W - 1),
                                  gr_field * k, 0.0)
            mask = (raw > eps).astype(gsm.dtype)
            gab_ref[0] += mask * gsm
            gatc_ref[0] += mask * gsm * t
            return lam

        def y_sweep_adjoint(cot, x_out, t):
            raw = bb + btc * t
            beta = jnp.maximum(raw, eps)
            cot_t = jnp.swapaxes(cot, -1, -2)
            x_out_t = jnp.swapaxes(x_out, -1, -2)
            beta_t = jnp.swapaxes(beta, -1, -2)
            lam_t = _sweepT_rows(cot_t, beta_t, dtf_y, eps, H)
            gr = _grad_r(lam_t, x_out_t, H)
            gr_field_t = jnp.sum(gr, axis=0) * dtf_y  # (W, H)
            k = jnp.asarray(1.0 / 3.0, gr_field_t.dtype)
            left = jnp.concatenate([jnp.zeros_like(gr_field_t[..., :1]),
                                    gr_field_t[..., :-1]], axis=-1)
            right = jnp.concatenate([gr_field_t[..., 1:],
                                     jnp.zeros_like(gr_field_t[..., :1])],
                                    axis=-1)
            gsm_t = (left + gr_field_t + right) * k
            idxc = lax.broadcasted_iota(jnp.int32, gsm_t.shape, gsm_t.ndim - 1)
            gsm_t = gsm_t + jnp.where((idxc == 0) | (idxc == H - 1),
                                      gr_field_t * k, 0.0)
            gsm = jnp.swapaxes(gsm_t, -1, -2)         # (H, W)
            mask = (raw > eps).astype(gsm.dtype)
            gbb_ref[0] += mask * gsm
            gbtc_ref[0] += mask * gsm * t
            return jnp.swapaxes(lam_t, -1, -2)

        def step_back(k, cot):
            s = num_steps - 1 - k
            u_s = res_ref[s]
            # recompute intra-step states
            alpha0 = jnp.maximum(ab + atc * ts_ref[s, 0], eps)
            x1 = _sweep_rows(u_s, alpha0, dt / 2, dx, eps, True, W)
            beta1 = jnp.maximum(bb + btc * ts_ref[s, 1], eps)
            x1_t = jnp.swapaxes(x1, -1, -2)
            x2_t = _sweep_rows(x1_t, jnp.swapaxes(beta1, -1, -2), dt, dy, eps,
                               True, H)
            x2 = jnp.swapaxes(x2_t, -1, -2)
            x3 = lax.cond(s == num_steps - 1,
                          lambda: out_final_ref[...],
                          lambda: res_ref[jnp.minimum(s + 1, num_steps - 1)])
            # adjoints in reverse substep order
            cot = x_sweep_adjoint(cot, x3, ts_ref[s, 2])
            cot = y_sweep_adjoint(cot, x2, ts_ref[s, 1])
            cot = x_sweep_adjoint(cot, x1, ts_ref[s, 0])
            return cot

        gu_ref[...] = lax.fori_loop(0, num_steps, step_back, g_ref[...])

    return kernel


def _fwd_call(u, ab, atc, bb, btc, *, dt, dx, dy, num_steps, ts, eps,
              tile_b, interpret):
    B, H, W = u.shape
    B_pad = -(-B // tile_b) * tile_b
    if B_pad != B:
        u = jnp.concatenate([u, jnp.zeros((B_pad - B, H, W), u.dtype)], 0)
    ts = jnp.asarray(np.asarray(ts, np.float32))
    kernel = _make_fwd_kernel(H=H, W=W, dt=dt, dx=dx, dy=dy, eps=eps,
                              num_steps=num_steps)
    field = pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((tile_b, H, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out, res = pl.pallas_call(
        kernel,
        grid=(B_pad // tile_b,),
        in_specs=[pl.BlockSpec((num_steps, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  tile, field, field, field, field],
        out_specs=(tile,
                   pl.BlockSpec((num_steps, tile_b, H, W),
                                lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B_pad, H, W), u.dtype),
                   jax.ShapeDtypeStruct((num_steps, B_pad, H, W), u.dtype)),
        interpret=interpret,
    )(ts, u, ab, atc, bb, btc)
    return out, res, B_pad


def _bwd_call(g, res, out_final, ab, atc, bb, btc, *, dt, dx, dy, num_steps,
              ts, eps, tile_b, interpret, B_pad):
    H, W = ab.shape
    if g.shape[0] != B_pad:
        g = jnp.concatenate(
            [g, jnp.zeros((B_pad - g.shape[0], H, W), g.dtype)], 0)
    ts = jnp.asarray(np.asarray(ts, np.float32))
    kernel = _make_bwd_kernel(H=H, W=W, dt=dt, dx=dx, dy=dy, eps=eps,
                              num_steps=num_steps)
    G = B_pad // tile_b
    field_in = pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM)
    field_out = pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((tile_b, H, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((num_steps, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  tile,
                  pl.BlockSpec((num_steps, tile_b, H, W),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
                  tile, field_in, field_in, field_in, field_in],
        out_specs=(tile, field_out, field_out, field_out, field_out),
        out_shape=(jax.ShapeDtypeStruct((B_pad, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, H, W), g.dtype),
                   jax.ShapeDtypeStruct((G, H, W), g.dtype)),
        interpret=interpret,
    )(ts, g, res, out_final, ab, atc, bb, btc)
    gu, gab, gatc, gbb, gbtc = outs
    return gu, gab.sum(0), gatc.sum(0), gbb.sum(0), gbtc.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def fused_grayscale_diffusion(u, ab, atc, bb, btc, dt, dx, dy, num_steps,
                              ts_tuple, eps=1e-6, tile_b=128,
                              interpret=False):
    """Trainable fused evolution.  ts_tuple: hashable tuple-of-tuples of the
    (num_steps, 3) substep times (static)."""
    out, _, _ = _fwd_call(u, ab, atc, bb, btc, dt=dt, dx=dx, dy=dy,
                          num_steps=num_steps, ts=ts_tuple, eps=eps,
                          tile_b=tile_b, interpret=interpret)
    return out[: u.shape[0]]


def _vjp_fwd(u, ab, atc, bb, btc, dt, dx, dy, num_steps, ts_tuple, eps,
             tile_b, interpret):
    out, res, B_pad = _fwd_call(u, ab, atc, bb, btc, dt=dt, dx=dx, dy=dy,
                                num_steps=num_steps, ts=ts_tuple, eps=eps,
                                tile_b=tile_b, interpret=interpret)
    return out[: u.shape[0]], (res, out, ab, atc, bb, btc, B_pad, u.shape[0])


def _vjp_bwd(dt, dx, dy, num_steps, ts_tuple, eps, tile_b, interpret,
             residuals, g):
    res, out_full, ab, atc, bb, btc, B_pad, B = residuals
    gu, gab, gatc, gbb, gbtc = _bwd_call(
        g, res, out_full, ab, atc, bb, btc, dt=dt, dx=dx, dy=dy,
        num_steps=num_steps, ts=ts_tuple, eps=eps, tile_b=tile_b,
        interpret=interpret, B_pad=B_pad)
    return gu[:B], gab, gatc, gbb, gbtc


fused_grayscale_diffusion.defvjp(_vjp_fwd, _vjp_bwd)
