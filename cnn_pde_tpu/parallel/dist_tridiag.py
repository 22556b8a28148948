"""Distributed tridiagonal solve along a SHARDED axis (substructuring /
partition method) — the third ADI-sharding strategy alongside halo-exchange
stencils and the all_to_all axis swap (parallel/spatial.py).

The all_to_all swap moves the *entire state tensor* across ICI twice per
Strang step so the solve axis is always local.  Here the solve axis stays
sharded and only the tiny interface system crosses devices:

1. Each shard holds m = n/S contiguous rows of every tridiagonal system.
   It solves three LOCAL systems with its block matrix T_loc (couplings to
   the neighbor shards dropped):
       x_d = T_loc⁻¹ d           (batched RHS)
       x_a = T_loc⁻¹ (a₀·e₁)     (influence of the left neighbor's last row)
       x_c = T_loc⁻¹ (c_m·e_m)   (influence of the right neighbor's first row)
   so the true solution restricted to the shard is
       x = x_d − x_a·x_L − x_c·x_R
   with x_L/x_R the (unknown) neighbor boundary values.
2. Writing that identity at each shard's first and last row couples only the
   2S boundary unknowns: a reduced (2S × 2S) system whose matrix depends on
   a/b/c alone (batch-free in every ADI sweep here — one factorization
   serves the whole batch) and whose RHS is 2 rows per shard of x_d.
   Two small ``all_gather``s (interface coefficients, interface RHS rows —
   O(S·rows) scalars total, vs O(n·rows) for the transpose approach)
   replicate it; every device solves
   it densely (2S ≤ 16) and extracts its two neighbor values.
3. One local AXPY finishes.  Everything is differentiable: the local solves
   carry the analytic tridiagonal adjoint (ops/tridiag.py) and the reduced
   solve is jnp.linalg.solve.

No reference counterpart (the reference is single-device; SURVEY.md §2.6) —
this is the TPU-native design for PDE grids too large for one chip where the
all_to_all transpose would bottleneck ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.adi import sweep_last_axis
from ..ops.tridiag import tridiag_solve

__all__ = [
    "tridiag_solve_partitioned",
    "sweep_sharded_axis",
    "adi_strang_step_partitioned",
]

AXIS = "spatial"


def tridiag_solve_partitioned(a, b, c, d, axis_name):
    """Solve tridiag(a, b, c)·x = d along the last axis when that axis is
    SHARDED over ``axis_name`` (call inside shard_map; every arg holds the
    local chunk).  a/b/c must share one (possibly batch-free) shape and
    broadcast against d, as in ops.tridiag.  Requires ≥2 local rows."""
    S = lax.axis_size(axis_name)
    if S == 1:
        return tridiag_solve(a, b, c, d)
    p = lax.axis_index(axis_name)
    m = d.shape[-1]
    assert m >= 2, "partitioned solve needs ≥2 rows per shard"

    # Couplings to the neighbor blocks.  tridiag_solve already treats
    # a[...,0] / c[...,-1] as outside its matrix, so the plain local solve IS
    # the T_loc solve; the couplings only feed the e₁/e_m RHS (masked to zero
    # at the global boundary, where no neighbor exists).
    a_left = jnp.where(p == 0, 0.0, a[..., 0])
    c_right = jnp.where(p == S - 1, 0.0, c[..., -1])

    e_first = jnp.zeros((m,), d.dtype).at[0].set(1.0)
    e_last = jnp.zeros((m,), d.dtype).at[-1].set(1.0)

    xd = tridiag_solve(a, b, c, d)
    xa = tridiag_solve(a, b, c, a_left[..., None] * e_first)
    xc = tridiag_solve(a, b, c, c_right[..., None] * e_last)

    # Interface rows → replicated reduced system.
    iface_abc = jnp.stack(
        [xa[..., 0], xa[..., -1], xc[..., 0], xc[..., -1]], axis=0)
    iface_d = jnp.stack([xd[..., 0], xd[..., -1]], axis=0)
    ga = lax.all_gather(iface_abc, axis_name)   # (S, 4, *F)
    gd = lax.all_gather(iface_d, axis_name)     # (S, 2, *Bd)

    # Unknowns z = [x_f0, x_l0, x_f1, x_l1, …]; equations per shard q:
    #   x_f_q + xa_f·z[2q−1] + xc_f·z[2q+2] = xd_f
    #   x_l_q + xa_l·z[2q−1] + xc_l·z[2q+2] = xd_l
    F = ga.shape[2:]
    n2 = 2 * S
    M = jnp.zeros(F + (n2, n2), d.dtype)
    for q in range(S):
        xaf, xal, xcf, xcl = ga[q, 0], ga[q, 1], ga[q, 2], ga[q, 3]
        if q > 0:
            M = M.at[..., 2 * q, 2 * q - 1].set(xaf)
            M = M.at[..., 2 * q + 1, 2 * q - 1].set(xal)
        if q < S - 1:
            M = M.at[..., 2 * q, 2 * q + 2].set(xcf)
            M = M.at[..., 2 * q + 1, 2 * q + 2].set(xcl)
    M = M + jnp.eye(n2, dtype=d.dtype)
    rhs = jnp.moveaxis(gd, (0, 1), (-2, -1))    # (*Bd, S, 2)
    rhs = rhs.reshape(rhs.shape[:-2] + (n2,))
    # One factorization serves the whole batch: M depends only on the
    # (batch-free) coefficients, so when rhs carries extra leading batch
    # dims over M's batch shape, fold them into RHS columns — one LU per
    # coefficient system, k triangular solves — instead of broadcasting a
    # fresh LU per batch element.
    Fd = M.shape[:-2]
    Bd = rhs.shape[:-1]
    if len(Bd) > len(Fd) and Bd[len(Bd) - len(Fd):] == Fd:
        import math

        ne = math.prod(Bd[:len(Bd) - len(Fd)])
        r2 = jnp.moveaxis(rhs.reshape((ne,) + Fd + (n2,)), 0, -1)
        z = jnp.moveaxis(jnp.linalg.solve(M, r2), -1, 0)
        z = z.reshape(Bd + (n2,))
    else:
        z = jnp.linalg.solve(M, rhs[..., None])[..., 0]

    xL = jnp.where(p == 0, 0.0,
                   lax.dynamic_index_in_dim(z, jnp.maximum(2 * p - 1, 0),
                                            axis=-1, keepdims=False))
    xR = jnp.where(p == S - 1, 0.0,
                   lax.dynamic_index_in_dim(
                       z, jnp.minimum(2 * p + 2, n2 - 1),
                       axis=-1, keepdims=False))
    return xd - xa * xL[..., None] - xc * xR[..., None]


def _smooth3_sharded(f, axis_name):
    """smooth3 (K6: 3-tap replicate moving average) along the last axis when
    that axis is sharded: one-element ppermute halos; global edges replicate
    the local edge value exactly like the unsharded jnp.pad(mode='edge')."""
    S = lax.axis_size(axis_name)
    p = lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(S - 1)]
    bwd = [(i + 1, i) for i in range(S - 1)]
    from_left = lax.ppermute(f[..., -1], axis_name, fwd)
    from_right = lax.ppermute(f[..., 0], axis_name, bwd)
    left = jnp.where(p == 0, f[..., 0], from_left)
    right = jnp.where(p == S - 1, f[..., -1], from_right)
    fl = jnp.concatenate([left[..., None], f[..., :-1]], axis=-1)
    fr = jnp.concatenate([f[..., 1:], right[..., None]], axis=-1)
    k = jnp.asarray(1.0 / 3.0, f.dtype)
    return fl * k + f * k + fr * k


def sweep_sharded_axis(u, coeff_field, dt, dh, *, smooth, eps, axis_name):
    """One implicit diffusion sweep (ops.adi.sweep_last_axis semantics —
    Neumann edges, optional K6 smoothing, eps on b) along the trailing axis
    when that axis is sharded over ``axis_name``."""
    S = lax.axis_size(axis_name)
    p = lax.axis_index(axis_name)
    if smooth:
        coeff_field = _smooth3_sharded(coeff_field, axis_name)
    r = coeff_field * (dt / (dh * dh))
    a = -r
    c = -r
    b = 1.0 + 2.0 * r
    # Neumann rows live at the GLOBAL edges only
    b = b.at[..., 0].set(jnp.where(p == 0, 1.0 + r[..., 0], b[..., 0]))
    b = b.at[..., -1].set(
        jnp.where(p == S - 1, 1.0 + r[..., -1], b[..., -1]))
    return tridiag_solve_partitioned(a, b + eps, c, u, axis_name)


def _adi_strang_local(u, alpha, beta, *, dt, dx, dy, smooth, eps, axis_name):
    """One Strang step with H sharded: x-sweeps local along W; the y-sweep
    solves straight through the sharded H axis (local transpose only — no
    all_to_all)."""
    u = sweep_last_axis(u, alpha, dt / 2, dx, smooth=smooth, eps=eps)
    u_t = jnp.swapaxes(u, -1, -2)              # (B, W, Hl)
    beta_t = jnp.swapaxes(beta, -1, -2)
    u_t = sweep_sharded_axis(u_t, beta_t, dt, dy, smooth=smooth, eps=eps,
                             axis_name=axis_name)
    u = jnp.swapaxes(u_t, -1, -2)
    return sweep_last_axis(u, alpha, dt / 2, dx, smooth=smooth, eps=eps)


def adi_strang_step_partitioned(mesh: Mesh, u, alpha, beta, *, dt, dx=1.0,
                                dy=1.0, smooth=False, eps=1e-6):
    """One Strang ADI step with H sharded over the mesh's 'spatial' axis,
    using the partitioned tridiagonal solve for the y direction.
    u: (B, H, W) global; alpha/beta: (H, W) global."""
    fn = jax.shard_map(
        partial(_adi_strang_local, dt=dt, dx=dx, dy=dy, smooth=smooth,
                eps=eps, axis_name=AXIS),
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(AXIS, None), P(AXIS, None)),
        out_specs=P(None, AXIS, None),
    )
    return fn(u, alpha, beta)
