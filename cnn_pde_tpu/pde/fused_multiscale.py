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

__all__ = ["fused_multiscale_evolve", "hoisted_lockstep_evolve"]


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


# ---- hoisted-lockstep formulation -------------------------------------------
#
# The lockstep above still pays a per-sweep PCR solve over the stacked RHS.
# Under the hoisted-operator regime (PERF.md §solver implementations: every
# sweep = ONE MXU matmul with a precomputed inverse, tridiag_solve_precomputed)
# this variant moves the identity padding into the operator stack itself:
# inactive steps get exact identity systems (r = 0 → a = c = 0, b = 1,
# X = I — no eps, and bf16(I) is exact), so the step loop is 8 uniform
# step-triples of stacked matmuls (24 sequential sweeps) instead of 17
# triples (51 sweeps), with no masking work in the loop and zero gradient
# leakage into padded steps (their bands are param-free constants).
#
# MEASURED SLOWER on v5e (PERF.md §lockstep: lockstep_bf16 3.20 ms vs
# sequential hoisted_bf16 1.75 ms flagship step): the stacked sweeps are
# work-bound, not launch-latency-bound, so padding to max(steps) executes
# ~4× the matmul+mixing work for only ~2× fewer dispatches.  Kept as a
# parity-tested study option (tests/test_fused_multiscale.py).


def _lockstep_neumann_b(r):
    """1+2r with Neumann BC rows, assembled by concat (see ops/adi.py)."""
    return jnp.concatenate([1.0 + r[..., :1], 1.0 + 2.0 * r[..., 1:-1],
                            1.0 + r[..., -1:]], axis=-1)


def hoisted_lockstep_evolve(u, branch_params, *, dts, steps_list, dxs, dys,
                            eps=1e-6, clamp_max=10.0,
                            operator_dtype=jnp.float32,
                            branch_sharding=None):
    """All K branches' Strang evolutions in lockstep with PRECOMPUTED sweep
    operators: state (B, K, C, H, W), 3·max(steps) sequential stacked-matmul
    sweeps.  Returns (B, K, C, H, W).

    Activations match the sequential hoisted path on active steps (identical
    bands; X rounding may differ at operator-dtype ties) and the default
    per-sweep path at ~1e-6 (f32 operators).

    ``branch_sharding``: optional NamedSharding for the stacked state
    (e.g. P(None, 'model') over the K axis) — BRANCH PARALLELISM.  The K
    axis is purely batched through the whole scan (channel mixing reduces
    over C, sweeps over H/W; K never mixes), so sharding it needs ZERO
    collectives inside the evolution; each device runs only its branches'
    24 stacked sweeps instead of the 51 a sequential single-device forward
    pays, and the one all-gather happens after the scan when the combine
    reads all branches.  See parallel/branch_parallel.py.
    """
    from ..ops.adi import apply_sweep, apply_sweep_y
    from ..ops.tridiag import tridiag_inverse_operator

    K = len(branch_params)
    B, C, H, W = u.shape
    S = max(steps_list)
    ts, active = _branch_time_tables(dts, steps_list, S)   # (K,S,3), (K,S)
    ts_s = jnp.swapaxes(ts, 0, 1)                          # (S, K, 3)
    act = jnp.swapaxes(active, 0, 1)                       # (S, K)

    stack = lambda name: jnp.stack([p[name] for p in branch_params])
    ab, at = stack("alpha_base"), stack("alpha_time_coeff")  # (K, C, H, W)
    bb, bt = stack("beta_base"), stack("beta_time_coeff")
    mix = stack("channel_mixing")                            # (K, C, C)
    eye = jnp.eye(C, dtype=mix.dtype)
    mix_eff = (act[:, :, None, None] * mix
               + (1.0 - act[:, :, None, None]) * eye)        # (S, K, C, C)

    dtfac_x = jnp.asarray([dt / 2 / dx**2 for dt, dx in zip(dts, dxs)],
                          jnp.float32)[None, :, None, None, None, None]
    dtfac_y = jnp.asarray([dt / dy**2 for dt, dy in zip(dts, dys)],
                          jnp.float32)[None, :, None, None, None]
    act_x = act[:, :, None, None, None, None]                # (S,K,1,1,1,1)
    act_y = act[:, :, None, None, None]

    def coeff(base, tc, t):
        # base (K,C,H,W), t (S,K,n) -> (S,K,n,C,H,W)
        c = base[None, :, None] + tc[None, :, None] * t[..., None, None, None]
        return jnp.clip(c, eps, clamp_max)

    def bands(r, act_b):
        a, c = -r, -r
        b = _lockstep_neumann_b(r) + eps * act_b
        X = tridiag_inverse_operator(
            lax.stop_gradient(a), lax.stop_gradient(b), lax.stop_gradient(c),
            operator_dtype)
        return a, b, c, X

    # x-sweeps: solve axis W.  r=0 on inactive steps (grads die at the mask).
    alpha = coeff(ab, at, ts_s[:, :, (0, 2)])                # (S,K,2,C,H,W)
    r_x = alpha * dtfac_x * act_x
    ox = bands(r_x, act_x)
    # y-sweeps: transposed fields, solve axis H
    beta_t = jnp.swapaxes(coeff(bb, bt, ts_s[:, :, 1:2])[:, :, 0],
                          -1, -2)                            # (S,K,C,W,H)
    r_y = beta_t * dtfac_y * act_y
    oy = bands(r_y, act_y)

    sub = lambda i: tuple(l[:, :, i] for l in ox)            # (S,K,C,H,*)
    xs = (mix_eff, sub(0), oy, sub(1))

    U = jnp.broadcast_to(u[:, None], (B, K, C, H, W))

    if branch_sharding is not None:
        # Pin the branch layout on the carry AND the per-step operator
        # stacks (K is dim 1 of the scan slices), so GSPMD keeps every
        # sweep local to its branch's devices instead of gathering.
        from jax.sharding import NamedSharding, PartitionSpec

        mesh_ = branch_sharding.mesh
        k_axis = branch_sharding.spec[1]
        ops_s = lambda nd: NamedSharding(
            mesh_, PartitionSpec(None, k_axis, *([None] * (nd - 2))))
        U = lax.with_sharding_constraint(U, branch_sharding)
        xs = jax.tree_util.tree_map(
            lambda x: lax.with_sharding_constraint(x, ops_s(x.ndim)), xs)

    def step(U, x):
        m, ox0, oyt, ox1 = x
        # per-branch channel mixing as broadcast multiply-reduce
        U = jnp.sum(m[None, :, :, :, None, None] * U[:, :, None], axis=3)
        U = apply_sweep(ox0, U)
        U = apply_sweep_y(oyt, U)
        U = apply_sweep(ox1, U)
        if branch_sharding is not None:
            U = lax.with_sharding_constraint(U, branch_sharding)
        return U, None

    U, _ = lax.scan(step, U, xs)
    return U
