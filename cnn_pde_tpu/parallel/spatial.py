"""Spatial sharding for PDE evolution — the CNN analogue of sequence/context
parallelism (SURVEY.md §2.6 item 2, §5).

Two communication patterns, both riding ICI via XLA collectives under
``jax.shard_map``:

* **Halo exchange** for explicit stencils: the FTCS update of a row needs its
  neighbors, so each step exchanges one boundary row with each neighbor shard
  via ``lax.ppermute``.  The reference's frozen-reflect-ring semantics
  (emotion_recognition.py:85) are preserved: the *global* pad ring keeps its
  initial values; only interior shard boundaries refresh.

* **all_to_all axis swap** for implicit ADI sweeps (the Ulysses-style
  transpose): a tridiagonal solve is sequential along its sweep axis, so the
  x-sweep runs with W local / H sharded, then one ``lax.all_to_all`` reshards
  to H local / W sharded for the y-sweep, and one more swaps back.  The solve
  itself never crosses devices — only two collectives per Strang substep pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.adi import sweep_last_axis
from ..ops.stencil import laplacian

__all__ = ["ftcs_evolve_spatial", "adi_strang_step_spatial",
           "laplacian_step_spatial"]

AXIS = "spatial"


def _ftcs_local(u, alpha, beta, nt, axis_name):
    """shard_map body: u (B, Hl, W), alpha/beta (Hl, W); H sharded over
    axis_name.

    Same interior-carry formulation as ops.stencil.ftcs_evolve (a per-step
    ``at[:, 1:-1, 1:-1].set`` measures 12× slower on v5e — PERF.md): the
    scan carries only the local interior; frozen ring values (global reflect
    pad, never re-synced — the reference quirk) are constants concatenated
    in as neighbors, and the two shard-boundary halo rows are refreshed each
    step from the neighbors' current edge rows via ppermute."""
    S = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # frozen ring values from the INITIAL state (reflect semantics):
    top_frozen = u[:, 1:2, :]       # valid on the global-top shard only
    bot_frozen = u[:, -2:-1, :]     # valid on the global-bottom shard only
    left, right = u[:, :, 1:2], u[:, :, -2:-1]

    def body(ui, _):
        if S > 1:
            from_prev = lax.ppermute(ui[:, -1:, :], axis_name,
                                     [(i, i + 1) for i in range(S - 1)])
            from_next = lax.ppermute(ui[:, :1, :], axis_name,
                                     [(i + 1, i) for i in range(S - 1)])
            top = jnp.where(idx == 0, top_frozen, from_prev)
            bot = jnp.where(idx == S - 1, bot_frozen, from_next)
        else:
            top, bot = top_frozen, bot_frozen
        u_up = jnp.concatenate([top, ui[:, :-1, :]], axis=1)
        u_dn = jnp.concatenate([ui[:, 1:, :], bot], axis=1)
        u_lf = jnp.concatenate([left, ui[:, :, :-1]], axis=2)
        u_rt = jnp.concatenate([ui[:, :, 1:], right], axis=2)
        u_xx = u_up + u_dn - 2.0 * ui
        u_yy = u_lf + u_rt - 2.0 * ui
        return ui + alpha * u_xx + beta * u_yy, None

    ui, _ = lax.scan(body, u, None, length=nt)
    return ui


def ftcs_evolve_spatial(mesh: Mesh, u, alpha, beta, nt: int):
    """FTCS evolution with H sharded over the mesh's 'spatial' axis.
    u: (B, H, W) global; alpha/beta: (H, W) global."""
    fn = jax.shard_map(
        partial(_ftcs_local, nt=nt, axis_name=AXIS),
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=P(None, AXIS, None),
    )
    return fn(u, alpha, beta)


def _laplacian_local(u, coeff, *, dt, axis_name):
    """shard_map body for the K8 conv-Laplacian step (tiny_imagenet.py:53-72)
    with H sharded: one ppermute halo row per neighbor, zero rows at the
    global edges (the reference's zero padding ⇒ Dirichlet-0 exterior)."""
    S = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    zero_row = jnp.zeros_like(u[:, :, :1, :])
    if S > 1:
        from_prev = lax.ppermute(u[:, :, -1:, :], axis_name,
                                 [(i, i + 1) for i in range(S - 1)])
        from_next = lax.ppermute(u[:, :, :1, :], axis_name,
                                 [(i + 1, i) for i in range(S - 1)])
        top = jnp.where(idx == 0, zero_row, from_prev)
        bot = jnp.where(idx == S - 1, zero_row, from_next)
    else:
        top, bot = zero_row, zero_row
    up = jnp.concatenate([top, u, bot], axis=2)      # (B, C, Hl+2, W)
    lap = laplacian(up)[:, :, 1:-1, :]               # interior rows only
    return u + coeff[None, :, None, None] * dt * lap


def laplacian_step_spatial(mesh: Mesh, u, coeff, *, dt):
    """One explicit conv-Laplacian step (K8 semantics, zero-pad exterior)
    with H sharded over the mesh's 'spatial' axis.
    u: (B, C, H, W) global; coeff: (C,) replicated."""
    fn = jax.shard_map(
        partial(_laplacian_local, dt=dt, axis_name=AXIS),
        mesh=mesh,
        in_specs=(P(None, None, AXIS, None), P(None)),
        out_specs=P(None, None, AXIS, None),
    )
    return fn(u, coeff)


def _swap_h_to_w(x, axis_name):
    """(.., Hl, W) → (.., H, Wl): all_to_all splits W, concatenates H."""
    return lax.all_to_all(x, axis_name, split_axis=x.ndim - 1,
                          concat_axis=x.ndim - 2, tiled=True)


def _swap_w_to_h(x, axis_name):
    return lax.all_to_all(x, axis_name, split_axis=x.ndim - 2,
                          concat_axis=x.ndim - 1, tiled=True)


def _adi_strang_local(u, alpha, beta, *, dt, dx, dy, smooth, eps, axis_name):
    """One Strang step (x half, y full, x half) with H sharded: x-sweeps are
    local; the y-sweep runs after an all_to_all axis swap."""
    u = sweep_last_axis(u, alpha, dt / 2, dx, smooth=smooth, eps=eps)

    u_sw = _swap_h_to_w(u, axis_name)          # (B, H, Wl)
    beta_sw = _swap_h_to_w(beta, axis_name)    # (H, Wl)
    u_t = jnp.swapaxes(u_sw, -1, -2)           # solve along H
    beta_t = jnp.swapaxes(beta_sw, -1, -2)
    u_t = sweep_last_axis(u_t, beta_t, dt, dy, smooth=smooth, eps=eps)
    u = _swap_w_to_h(jnp.swapaxes(u_t, -1, -2), axis_name)

    u = sweep_last_axis(u, alpha, dt / 2, dx, smooth=smooth, eps=eps)
    return u


def adi_strang_step_spatial(mesh: Mesh, u, alpha, beta, *, dt, dx=1.0, dy=1.0,
                            smooth=False, eps=1e-6):
    """One spatially-sharded Strang ADI step.
    u: (B, H, W) global with H sharded; alpha/beta: (H, W) global."""
    fn = jax.shard_map(
        partial(_adi_strang_local, dt=dt, dx=dx, dy=dy, smooth=smooth,
                eps=eps, axis_name=AXIS),
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=P(None, AXIS, None),
    )
    return fn(u, alpha, beta)
