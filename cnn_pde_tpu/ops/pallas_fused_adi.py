"""Fused whole-layer Pallas kernel: an entire multi-step Strang ADI diffusion
evolution in ONE kernel launch, with the state tile resident in VMEM.

Motivation: the XLA path executes ~10 fused ops per sweep × 3 sweeps × S steps
per layer, each materializing intermediates to HBM; at small batch the step is
dominated by per-op dispatch latency.  Here the whole evolution runs on a
(TILE_B, H, W) VMEM tile: HBM traffic is one read + one write of u plus the
(H, W) coefficient fields — the speed-of-light floor for this op.

The solve inside the kernel is PCR with jnp.roll-based shifts (identical
system ⇒ ≤float-roundoff difference vs the Thomas recurrence).  Forward only —
it backs the inference/serving path and forward-heavy analysis; training uses
the XLA path with the analytic custom-VJP (the backward would need per-step
state recompute in VMEM, planned follow-up).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_grayscale_diffusion_fwd"]


def _smooth3_edge(f):
    """3-tap replicate moving average along the last axis (K6) without pad."""
    left = jnp.concatenate([f[..., :1], f[..., :-1]], axis=-1)
    right = jnp.concatenate([f[..., 1:], f[..., -1:]], axis=-1)
    k = jnp.asarray(1.0 / 3.0, f.dtype)
    return left * k + f * k + right * k


def _pcr_rows(a, b, c, d, n):
    """PCR along the last axis; a/b/c shaped (..., n) (batch-free), d batched."""
    idx = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def shift_right(x, s, fill):
        rolled = jnp.roll(x, s, axis=-1)
        return jnp.where(idx >= s, rolled, fill)

    def shift_left(x, s, fill):
        rolled = jnp.roll(x, -s, axis=-1)
        return jnp.where(idx < n - s, rolled, fill)

    levels = max(1, (n - 1).bit_length())
    s = 1
    for _ in range(levels):
        alpha = -a / shift_right(b, s, 1.0)
        gamma = -c / shift_left(b, s, 1.0)
        a, b, c, d = (
            alpha * shift_right(a, s, 0.0),
            b + alpha * shift_right(c, s, 0.0) + gamma * shift_left(a, s, 0.0),
            gamma * shift_left(c, s, 0.0),
            d + alpha * shift_right(d, s, 0.0) + gamma * shift_left(d, s, 0.0),
        )
        s *= 2
    return d / b


def _sweep_rows(lines, field2d, dt, dh, eps, smooth, n):
    """One implicit sweep along the last axis of (B·H, W)-style lines with a
    (H, W) field broadcast over the tile batch."""
    f = _smooth3_edge(field2d) if smooth else field2d
    r = f * (dt / (dh * dh))
    idx = lax.broadcasted_iota(jnp.int32, r.shape, r.ndim - 1)
    b = jnp.where((idx == 0) | (idx == n - 1), 1.0 + r, 1.0 + 2.0 * r) + eps
    a = -r
    a = jnp.where(idx == 0, 0.0, a)
    c = -r
    c = jnp.where(idx == n - 1, 0.0, c)
    return _pcr_rows(a, b, c, lines, n)


def _make_kernel(*, H, W, dt, dx, dy, eps, num_steps):
    def kernel(ts_ref, u_ref, ab_ref, atc_ref, bb_ref, btc_ref, out_ref):
        ab = ab_ref[...]
        atc = atc_ref[...]
        bb = bb_ref[...]
        btc = btc_ref[...]

        def step(s, u):
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


def fused_grayscale_diffusion_fwd(u, alpha_base, alpha_tc, beta_base, beta_tc,
                                  *, dt, dx, dy, num_steps, ts, eps=1e-6,
                                  tile_b=128, interpret=False):
    """u: (B, H, W); coefficient fields (H, W); ts: (num_steps, 3) python/numpy
    substep times.  Returns the evolved (B, H, W)."""
    B, H, W = u.shape
    B_pad = -(-B // tile_b) * tile_b
    if B_pad != B:
        u = jnp.concatenate(
            [u, jnp.zeros((B_pad - B, H, W), u.dtype)], axis=0)

    import numpy as np

    ts = jnp.asarray(np.asarray(ts, np.float32))
    kernel = _make_kernel(H=H, W=W, dt=dt, dx=dx, dy=dy, eps=eps,
                          num_steps=num_steps)
    field_spec = pl.BlockSpec((H, W), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B_pad // tile_b,),
        in_specs=[
            pl.BlockSpec((num_steps, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            field_spec, field_spec, field_spec, field_spec,
        ],
        out_specs=pl.BlockSpec((tile_b, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, H, W), u.dtype),
        interpret=interpret,
    )(ts, u, alpha_base, alpha_tc, beta_base, beta_tc)
    return out[:B]
