"""Explicit PDE time-step kernels (K7, K8).

* ``ftcs_evolve`` — the emotion-recognition FTCS scheme (emotion_recognition.py:82-97):
  reflect-pad applied ONCE before the Nt-step loop, so the 1-pixel boundary ring is
  frozen at its initial reflected values for all subsequent steps (a latent quirk of
  the reference that parity requires reproducing — SURVEY.md §2.7).

* ``laplacian_step`` — the tiny-imagenet conv2d 5-point Laplacian explicit step
  (tiny_imagenet.py:53-72): zero padding ⇒ implicit Dirichlet-0 exterior,
  then u + coeff·dt·Δu per channel.

Both are fully fused by XLA on TPU (elementwise + small depthwise conv); no Python
loops survive tracing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["ftcs_evolve", "laplacian_step", "laplacian"]

# lax.scan unroll= for the FTCS step loop.  The step body is light
# elementwise work near the device-loop per-iteration floor
# (tools/ab_loop_floor.py: ~13 µs/iter regardless of body), so fully
# unrolling the 10-step emotion evolution deletes loop overhead in both
# the forward and the transposed backward scan: emotion train step
# 0.353 → 0.330 ms (−6.7%, tools/ab_ftcs_unroll.py; recheck 0.351
# confirms the window).  True = full unroll; semantics-preserving.
FTCS_SCAN_UNROLL = True


def ftcs_evolve(u: jnp.ndarray, alpha_grid: jnp.ndarray, beta_grid: jnp.ndarray,
                nt: int) -> jnp.ndarray:
    """Nt explicit FTCS steps on (B, H, W) with a one-time reflect-padded ring.

    u[i,j] += alpha·(u[i+1,j] - 2u[i,j] + u[i-1,j]) + beta·(u[i,j+1] - 2u[i,j] + u[i,j-1])

    ``alpha_grid``/``beta_grid`` are (H, W) (already folded with dt/dx² — see
    emotion_recognition.py:77-80); broadcast over batch.

    TPU formulation: the scan carries ONLY the interior; the frozen boundary
    ring (reflect-padded once, never re-synced — the reference quirk,
    SURVEY.md §2.7) is four small constants concatenated in as neighbor rows/
    columns each step.  The padded-buffer alternative — an in-place
    ``at[:, 1:-1, 1:-1].set`` per step — lowers to an unaligned
    dynamic-update-slice on the lane axis and measures 12× SLOWER on v5e
    (1.58 → 0.13 ms fwd+bwd at (64, 48, 48) × 10 steps; PERF.md).  The ring
    corners are never read by the 5-point stencil, so carrying the interior
    is exact (≤2e-7 vs the padded form, fusion reassociation only).
    """
    up0 = jnp.pad(u, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    top, bot = up0[:, 0:1, 1:-1], up0[:, -1:, 1:-1]      # (B, 1, W)
    left, right = up0[:, 1:-1, 0:1], up0[:, 1:-1, -1:]   # (B, H, 1)

    def body(ui, _):
        u_up = jnp.concatenate([top, ui[:, :-1, :]], axis=1)
        u_dn = jnp.concatenate([ui[:, 1:, :], bot], axis=1)
        u_lf = jnp.concatenate([left, ui[:, :, :-1]], axis=2)
        u_rt = jnp.concatenate([ui[:, :, 1:], right], axis=2)
        u_xx = u_up + u_dn - 2.0 * ui
        u_yy = u_lf + u_rt - 2.0 * ui
        return ui + alpha_grid * u_xx + beta_grid * u_yy, None

    ui, _ = lax.scan(body, u, None, length=nt, unroll=FTCS_SCAN_UNROLL)
    return ui


# numpy (not jnp) on purpose: a module-level device array would initialize
# the XLA backend at import time, which breaks jax.distributed.initialize
# (multi-host bring-up must precede any backend use)
_LAPLACIAN_KERNEL = np.array(
    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], dtype=np.float32
)


def laplacian(u: jnp.ndarray) -> jnp.ndarray:
    """5-point Laplacian with zero (Dirichlet-0) padding on NCHW input,
    matching F.conv2d(laplacian_kernel, padding=1) at tiny_imagenet.py:69.

    Implemented as zero-padded SHIFT-ADDS, not a depthwise conv: a C=3
    groups=3 conv is a degenerate op (one 3×3 kernel per single-channel
    group — no MXU work to tile) that measured ~24× its bandwidth floor on
    the tiny_imagenet front-end; the shift form is pure VPU arithmetic on
    the same tensor (same values up to f32 add reassociation ~1e-7, inside
    the 1e-5 parity budget).  A/B: ops/stencil.py::_laplacian_conv kept for
    the test oracle; PERF.md §tiny front-end."""
    z_row = jnp.zeros_like(u[:, :, :1, :])
    down = jnp.concatenate([u[:, :, 1:, :], z_row], axis=2)    # u[i+1, j]
    up = jnp.concatenate([z_row, u[:, :, :-1, :]], axis=2)     # u[i-1, j]
    z_col = jnp.zeros_like(u[..., :1])
    right = jnp.concatenate([u[..., 1:], z_col], axis=-1)      # u[i, j+1]
    left = jnp.concatenate([z_col, u[..., :-1]], axis=-1)      # u[i, j-1]
    return (up + down) + (left + right) - 4.0 * u


def _laplacian_conv(u: jnp.ndarray) -> jnp.ndarray:
    """The original depthwise-conv formulation (test oracle / A/B)."""
    C = u.shape[1]
    kernel = jnp.broadcast_to(
        _LAPLACIAN_KERNEL.astype(u.dtype)[None, None], (C, 1, 3, 3)
    )
    return lax.conv_general_dilated(
        u,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )


def laplacian_step(u: jnp.ndarray, coeff: jnp.ndarray, dt: float) -> jnp.ndarray:
    """u + coeff·dt·Δu with per-channel coeff (C,) — tiny_imagenet.py:66-72."""
    return u + coeff[None, :, None, None] * dt * laplacian(u)
