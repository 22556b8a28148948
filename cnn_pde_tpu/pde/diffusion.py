"""ADI diffusion layers (P1-P5): learnable anisotropic-diffusion PDE evolution.

Five reference variants share one engine here, parameterized by splitting
scheme, coefficient shape, smoothing, coupling and skip options
(SURVEY.md §2.2):

  P1 GrayscaleDiffusion   mnist_test.py:11-219    (size 28, dt 1e-3, 10 steps, Strang)
  P2 GrayscaleDiffusion   fashion_mnist.py:18-196 (dt 0.3, 4 steps; y-sweep reuses dx)
  P3 ChannelCoupledDiffusion  SVHN.py:12-230      (per-channel fields, coupling after
                                                   sweeps, learnable sigmoid skip)
  P4 MixedChannelDiffusion    cifar10.py:24-211   (mixing before sweeps, Strang,
                                                   clamp [eps, 10], no smoothing)
  P5 MixedChannelDiffusion    cifar_2version.py:20-187 (Lie splitting x(dt/2), y(dt/2))

Time bookkeeping is reproduced exactly: coefficients are re-evaluated at
t, t+dt/2, t+dt within each step; t advances by dt/2 after substeps 1 and 2 and
never after substep 3 (mnist_test.py:50-63 — parity-relevant, SURVEY.md §2.7).

TPU-first notes: every sweep is one batched tridiagonal solve (ops.adi) whose
elimination chain is shared across the batch; the per-step Python loop unrolls
at trace time (num_steps ≤ 10) into one fused XLA computation — versus the
reference's ~2·N·steps separate kernel launches.  Channel mixing/coupling are
small matmuls on the MXU.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.core import Module
from ..ops.adi import apply_sweep, apply_sweep_y, sweep_operator, sweep_x, sweep_y
from .linearize import linearized_apply

__all__ = ["GrayscaleDiffusion", "ChannelCoupledDiffusion", "MixedChannelDiffusion"]

# Unroll factor for the hoisted step scan (lax.scan unroll=).  The hoisted
# step body is a handful of small matmuls whose cost sits AT the device-loop
# per-iteration floor (~13 µs/iter, tools/ab_loop_floor.py), so fully
# unrolling the 4-10-step scan removes loop overhead in both the forward and
# the transposed backward scan: flagship AMP step 1.74 → 1.62 ms (−7%,
# tools/ab_hoisted_unroll.py; partial unrolls 2/4 LOSE — they keep the loop
# and fatten its body).  The non-hoisted scans keep unroll=1 (measured loss
# there — heavier bodies, PERF.md §negative).  True = full unroll.
HOISTED_SCAN_UNROLL = True


def _coeff_at_times(base, time_coeff, times, eps, cmax=None):
    """Vectorized _coeff_at over a (...,)-shaped stack of static times:
    returns coefficients of shape times.shape + base.shape."""
    t = times.reshape(times.shape + (1,) * base.ndim)
    c = base + time_coeff * t
    return jnp.clip(c, eps, cmax) if cmax is not None else jnp.maximum(c, eps)


def _hoisted_operators(params, ts, dt, dt_y, dx, dy, *, smooth, eps,
                       cmax=None, strang=True, operator_dtype=jnp.float32):
    """Precompute ALL sweep inverse operators of an evolution in two batched
    PCR calls (x and y), hoisted out of the sequential step loop.

    Coefficient fields are batch-free and substep times static, so the
    operators cost rows ∝ steps·C·H·N (batch-independent); the step loop
    then applies them as MXU matmuls (ops/adi.py hoisted formulation).
    Returns scan xs: for Strang a 3-tuple (x@t, y@t+dt/2, x@t+dt) of per-step
    operator pytrees, for Lie a 2-tuple (x@t, y@t+dt/2)."""
    x_times = ts[:, (0, 2)] if strang else ts[:, :1]
    alpha = _coeff_at_times(params["alpha_base"], params["alpha_time_coeff"],
                            x_times, eps, cmax)
    ops_x = sweep_operator(alpha, dt / 2, dx, smooth=smooth, eps=eps,
                           dtype=operator_dtype)
    beta = _coeff_at_times(params["beta_base"], params["beta_time_coeff"],
                           ts[:, 1], eps, cmax)
    ops_y = sweep_operator(jnp.swapaxes(beta, -1, -2), dt_y, dy,
                           smooth=smooth, eps=eps, dtype=operator_dtype)
    sub = lambda i: tuple(l[:, i] for l in ops_x)  # noqa: E731
    if strang:
        return sub(0), ops_y, sub(1)
    return sub(0), ops_y


_OPERATOR_CAPTURE = None


@contextmanager
def capture_operators():
    """Trace-time capture of hoisted sweep operators, for frozen-params
    serving (serve.cache_hoisted_operators).  While active, every hoisted
    layer that COMPUTES its operators appends ``(layer, operators)`` to the
    yielded list — under jit the operators are tracers, which the probe
    function returns so they materialize as concrete arrays in layer order."""
    global _OPERATOR_CAPTURE
    prev, cap = _OPERATOR_CAPTURE, []
    _OPERATOR_CAPTURE = cap
    try:
        yield cap
    finally:
        _OPERATOR_CAPTURE = prev


def _layer_operators(layer, params, ts, dt, dt_y, dx, dy, *, smooth, eps,
                     cmax=None, strang=True, train=False):
    """The hoisted branch's operator source: a pinned ``operator_cache``
    (serving with frozen params) or a fresh in-graph computation.

    The cache is NOT differentiable w.r.t. params and goes stale the moment
    params change, so training with a cache pinned is refused outright."""
    cache = getattr(layer, "operator_cache", None)
    if cache is not None:
        if train:
            raise ValueError(
                "operator_cache is pinned on this layer (frozen-params "
                "serving mode) but apply() was called with ctx.train=True; "
                "clear_operator_cache(model) before training")
        return cache
    xs = _hoisted_operators(params, ts, dt, dt_y, dx, dy, smooth=smooth,
                            eps=eps, cmax=cmax, strang=strang,
                            operator_dtype=layer.operator_dtype)
    if _OPERATOR_CAPTURE is not None:
        _OPERATOR_CAPTURE.append((layer, xs))
    return xs


def _substep_times_np(dt: float, num_steps: int) -> np.ndarray:
    """(num_steps, 3) coefficient evaluation times, accumulated in float64
    exactly as the reference's python-float bookkeeping (t, t+dt/2, t+dt per
    step; t advances by dt after each full step — mnist_test.py:50-63)."""
    ts = np.empty((num_steps, 3), np.float64)
    t = 0.0
    for s in range(num_steps):
        ts[s, 0] = t
        t += dt / 2
        ts[s, 1] = t
        t += dt / 2
        ts[s, 2] = t
    return ts


def _substep_times(dt: float, num_steps: int) -> jnp.ndarray:
    """Device constant of _substep_times_np.  Precomputed so the per-step
    loop can be a lax.scan (one traced body instead of num_steps unrolled
    copies — ~10× faster compiles)."""
    return jnp.asarray(_substep_times_np(dt, num_steps), jnp.float32)


def _substep_times_tuple(dt: float, num_steps: int):
    """Hashable (static) tuple-of-tuples form for the fused Pallas kernels.
    Must come from the numpy times, NOT the traced device array — converting
    a tracer back to numpy fails under jit."""
    return tuple(map(tuple, _substep_times_np(dt, num_steps).tolist()))


def _coeff_at(base, time_coeff, t, eps, cmax=None):
    """α(t) = clamp(α_base + α_time·t) — mnist_test.py:33-42; the CIFAR variants
    additionally clamp above at 10.0 (cifar10.py:60-61)."""
    c = base + time_coeff * t
    return jnp.clip(c, eps, cmax) if cmax is not None else jnp.maximum(c, eps)


class GrayscaleDiffusion(Module):
    """P1/P2: single-channel ADI diffusion with per-pixel coefficient fields.

    forward(u: (B, 1, H, W)) -> (B, 1, H, W); Strang splitting
    x(dt/2) → y(dt) → x(dt/2) per step with time-dependent coefficients.
    """

    def __init__(self, size=28, dt=0.001, dx=1.0, dy=1.0, num_steps=10,
                 init_value=2.0, eps=1e-6, remat=False, fused_inference=False,
                 fused=False, fused_tile_b=16, hoisted=False,
                 operator_dtype=jnp.float32, hoisted_refine=False):
        self.size = size
        self.dt = dt
        self.dx = dx
        self.dy = dy
        self.num_steps = num_steps
        self.init_value = init_value
        self.eps = eps
        self.remat = remat  # rematerialize per-step (memory ∝ 1 step for bwd)
        # hoisted=True precomputes every sweep's inverse operator outside the
        # step loop (batch-free rows) and applies them as MXU matmuls.  The
        # default apply is the single-matmul custom-VJP form
        # (tridiag_solve_precomputed); hoisted_refine=True keeps the older
        # two-matmul implicit-function/Richardson form (measured slower —
        # PERF.md §hoisted) for study.  Numerics agree with the per-sweep
        # default path at the operator dtype's scale (~1e-6 f32 / ~4e-3 bf16).
        self.hoisted = hoisted
        self.hoisted_refine = hoisted_refine
        self.operator_dtype = operator_dtype  # bf16 = AMP-analogue hoisted
        # opt-in Pallas paths (≤3e-7 fwd diff; grads ~1e-8 vs XLA).  They cut
        # launch count to 1, which wins only when per-dispatch latency
        # dominates (isolated calls over a slow link); in chained loops the
        # XLA path — batch-free PCR, state VMEM-resident across steps — is
        # the measured fast path (PERF.md).  fused_tile_b ≤ 16 keeps the
        # trainable backward inside the 16MB scoped-vmem limit at 10 steps.
        self.fused_inference = fused_inference
        self.fused = fused
        self.fused_tile_b = fused_tile_b
        # test hook: run the fused kernels in interpret mode off-TPU
        self.fused_interpret = False

    def init(self, key):
        s = self.size
        params = {
            "alpha_base": jnp.full((s, s), self.init_value, jnp.float32),
            "beta_base": jnp.full((s, s), self.init_value, jnp.float32),
            "alpha_time_coeff": jnp.zeros((s, s), jnp.float32),
            "beta_time_coeff": jnp.zeros((s, s), jnp.float32),
        }
        return params, {}

    def apply(self, params, state, u, ctx):
        lin = linearized_apply(self, params, state, u, ctx)
        if lin is not None:
            return lin, state
        x = u[:, 0]  # squeeze channel (mnist_test.py:46)
        ts = _substep_times(self.dt, self.num_steps)

        # eval prefers the forward-only kernel: the trainable one streams the
        # per-step residual tensor to HBM, which inference doesn't need
        if (self.fused_inference and ctx is not None and not ctx.train
                and jax.default_backend() == "tpu"):
            from ..ops.pallas_fused_adi import fused_grayscale_diffusion_fwd

            out = fused_grayscale_diffusion_fwd(
                x, params["alpha_base"], params["alpha_time_coeff"],
                params["beta_base"], params["beta_time_coeff"],
                dt=self.dt, dx=self.dx, dy=self.dy,
                num_steps=self.num_steps, ts=ts, eps=self.eps)
            return out[:, None], state

        if self.fused and (self.fused_interpret
                           or jax.default_backend() == "tpu"):
            from ..ops.pallas_fused_adi_vjp import fused_grayscale_diffusion

            ts_tuple = _substep_times_tuple(self.dt, self.num_steps)
            out = fused_grayscale_diffusion(
                x, params["alpha_base"], params["alpha_time_coeff"],
                params["beta_base"], params["beta_time_coeff"],
                self.dt, self.dx, self.dy, self.num_steps, ts_tuple,
                self.eps, self.fused_tile_b, self.fused_interpret)
            return out[:, None], state

        if self.hoisted:
            xs = _layer_operators(
                self, params, ts, self.dt, self.dt, self.dx, self.dy,
                smooth=True, eps=self.eps, strang=True,
                train=ctx is not None and ctx.train)

            refine = self.hoisted_refine

            def step(x, ops):
                ops_x0, ops_y, ops_x1 = ops
                x = apply_sweep(ops_x0, x, refine=refine)
                x = apply_sweep_y(ops_y, x, refine=refine)
                x = apply_sweep(ops_x1, x, refine=refine)
                return x, None

            if self.remat:
                step = jax.checkpoint(step)
            x, _ = lax.scan(step, x, xs, unroll=HOISTED_SCAN_UNROLL)
            return x[:, None], state

        def step(x, t3):
            alpha = _coeff_at(params["alpha_base"], params["alpha_time_coeff"],
                              t3[0], self.eps)
            x = sweep_x(x, alpha, self.dt / 2, self.dx, smooth=True, eps=self.eps)
            beta = _coeff_at(params["beta_base"], params["beta_time_coeff"],
                             t3[1], self.eps)
            x = sweep_y(x, beta, self.dt, self.dy, smooth=True, eps=self.eps)
            alpha = _coeff_at(params["alpha_base"], params["alpha_time_coeff"],
                              t3[2], self.eps)
            x = sweep_x(x, alpha, self.dt / 2, self.dx, smooth=True, eps=self.eps)
            return x, None

        if self.remat:
            step = jax.checkpoint(step)
        x, _ = lax.scan(step, x, ts)
        return x[:, None], state

    def stability_info(self, params):
        """CFL diagnostic — mnist_test.py:200-219 (stable iff α·dt/dx² < 0.5)."""
        horizon = self.dt * self.num_steps
        alpha_max = jnp.max(params["alpha_base"] +
                            jnp.abs(params["alpha_time_coeff"]) * horizon)
        beta_max = jnp.max(params["beta_base"] +
                           jnp.abs(params["beta_time_coeff"]) * horizon)
        cfl_x = float(alpha_max * self.dt / self.dx**2)
        cfl_y = float(beta_max * self.dt / self.dy**2)
        return {
            "cfl_x": cfl_x, "cfl_y": cfl_y,
            "dx": self.dx, "dy": self.dy, "dt": self.dt,
            "stable_x": cfl_x < 0.5, "stable_y": cfl_y < 0.5,
        }


class ChannelCoupledDiffusion(Module):
    """P3 (SVHN): per-channel coefficient fields, Strang sweeps (y reuses dx —
    SVHN.py:64), cross-channel coupling u ← u @ Cᵀ after each step's sweeps
    (SVHN.py:68-86), and a final learnable sigmoid skip blend (SVHN.py:74)."""

    def __init__(self, size=32, channels=3, dt=0.01, dx=1.0, num_steps=10,
                 eps=1e-6, hoisted=False, operator_dtype=jnp.float32,
                 hoisted_refine=False):
        self.size = size
        self.channels = channels
        self.dt = dt
        self.dx = dx
        self.num_steps = num_steps
        self.eps = eps
        self.hoisted = hoisted  # see GrayscaleDiffusion
        self.hoisted_refine = hoisted_refine
        self.operator_dtype = operator_dtype

    def init(self, key):
        s, C = self.size, self.channels
        k1, k2 = jax.random.split(key)
        params = {
            "alpha_base": jnp.full((C, s, s), 0.1, jnp.float32),
            "beta_base": jnp.full((C, s, s), 0.1, jnp.float32),
            "alpha_time_coeff": jax.random.normal(k1, (C, s, s)) * 0.001,
            "beta_time_coeff": jax.random.normal(k2, (C, s, s)) * 0.001,
            "channel_coupling": jnp.eye(C, dtype=jnp.float32) * 0.01,
            "skip_weight": jnp.asarray(0.9, jnp.float32),
        }
        return params, {}

    def apply(self, params, state, u, ctx):
        lin = linearized_apply(self, params, state, u, ctx)
        if lin is not None:
            return lin, state
        u0 = u
        ts = _substep_times(self.dt, self.num_steps)

        def couple(u):
            # coupling: (B,C,H,W) pixels as rows × Cᵀ (SVHN.py:78-86), as an
            # elementwise broadcast multiply-reduce — exact f32 (inside the
            # 1e-5 parity budget) and avoids the degenerate-matmul layout
            # transposes an einsum would pay (see MixedChannelDiffusion._mix)
            coup = params["channel_coupling"]
            return jnp.sum(coup[:, :, None, None] * u[:, None, :, :, :], axis=2)

        if self.hoisted:
            xs = _layer_operators(
                self, params, ts, self.dt, self.dt, self.dx, self.dx,
                smooth=True, eps=self.eps, strang=True,
                train=ctx is not None and ctx.train)

            refine = self.hoisted_refine

            def step(u, ops):
                ops_x0, ops_y, ops_x1 = ops
                u = apply_sweep(ops_x0, u, refine=refine)
                u = apply_sweep_y(ops_y, u, refine=refine)
                u = apply_sweep(ops_x1, u, refine=refine)
                return couple(u), None

            u, _ = lax.scan(step, u, xs, unroll=HOISTED_SCAN_UNROLL)
            s = jax.nn.sigmoid(params["skip_weight"])
            return s * u0 + (1.0 - s) * u, state

        def step(u, t3):
            alpha = _coeff_at(params["alpha_base"], params["alpha_time_coeff"],
                              t3[0], self.eps)
            u = sweep_x(u, alpha, self.dt / 2, self.dx, smooth=True, eps=self.eps)
            beta = _coeff_at(params["beta_base"], params["beta_time_coeff"],
                             t3[1], self.eps)
            u = sweep_y(u, beta, self.dt, self.dx, smooth=True, eps=self.eps)
            alpha = _coeff_at(params["alpha_base"], params["alpha_time_coeff"],
                              t3[2], self.eps)
            u = sweep_x(u, alpha, self.dt / 2, self.dx, smooth=True, eps=self.eps)
            u = couple(u)
            return u, None

        u, _ = lax.scan(step, u, ts)
        s = jax.nn.sigmoid(params["skip_weight"])
        return s * u0 + (1.0 - s) * u, state


class MixedChannelDiffusion(Module):
    """P4/P5: per-channel fields with learnable channel mixing *before* the
    sweeps each step (cifar10.py:91, cifar_2version.py:86).

    splitting='strang' → x(dt/2), y(dt), x(dt/2)   (cifar10.py:94-110)
    splitting='lie'    → x(dt/2), y(dt/2)          (cifar_2version.py:93-99)
    No coefficient smoothing (parity: the CIFAR variants pass raw coefficients).
    """

    def __init__(self, size=32, channels=3, dt=0.001, dx=1.0, dy=1.0,
                 num_steps=10, splitting="strang", eps=1e-6, clamp_max=10.0,
                 remat=False, fused_inference=False, fused=False,
                 fused_tile_b=32, fused_train_tile_b=8, hoisted=False,
                 operator_dtype=jnp.float32, hoisted_refine=False):
        assert splitting in ("strang", "lie")
        self.hoisted = hoisted  # see GrayscaleDiffusion
        self.hoisted_refine = hoisted_refine
        self.operator_dtype = operator_dtype
        self.size = size
        self.channels = channels
        self.dt = dt
        self.dx = dx
        self.dy = dy
        self.num_steps = num_steps
        self.splitting = splitting
        self.eps = eps
        self.clamp_max = clamp_max
        self.remat = remat
        # eval-mode single-launch Pallas path (ops/pallas_fused_channel.py);
        # also f32-exact where the XLA path's bf16 mixing einsum drifts
        self.fused_inference = fused_inference
        # full fused mode: forward AND backward as single Pallas kernels
        # (ops/pallas_fused_channel_vjp.py), incl. mixing adjoint.  The
        # trainable path holds per-step residuals in the VMEM block, so its
        # tile must stay small (tile 16+ exceeds the 16MB scoped-vmem limit
        # at CIFAR shapes)
        self.fused = fused
        self.fused_tile_b = fused_tile_b
        self.fused_train_tile_b = fused_train_tile_b
        # test hook: run the fused kernels in interpret mode off-TPU
        self.fused_interpret = False

    def init(self, key):
        s, C = self.size, self.channels
        params = {
            "alpha_base": jnp.ones((C, s, s), jnp.float32),
            "beta_base": jnp.ones((C, s, s), jnp.float32),
            # torch.zeros(...)·0.1 is a no-op (cifar10.py:40-41) — plain zeros
            "alpha_time_coeff": jnp.zeros((C, s, s), jnp.float32),
            "beta_time_coeff": jnp.zeros((C, s, s), jnp.float32),
            "channel_mixing": jnp.eye(C, dtype=jnp.float32)
            + jax.random.normal(key, (C, C)) * 0.01,
        }
        return params, {}

    def _mix(self, params, u):
        """mixing @ u over the channel axis (cifar10.py:65-72) as a
        broadcast multiply-reduce, NOT an einsum: a (C=3)-wide contraction
        is a degenerate matmul whose transpose rule forces whole-tensor
        layout changes — the elementwise form is pure f32 VPU math (exact,
        inside the 1e-5 parity budget) and measures 2.1× faster fwd+bwd
        over a full evolution (PERF.md)."""
        m = params["channel_mixing"]
        return jnp.sum(m[:, :, None, None] * u[:, None, :, :, :], axis=2)

    def apply(self, params, state, u, ctx):
        lin = linearized_apply(self, params, state, u, ctx)
        if lin is not None:
            return lin, state
        eps, cmax = self.eps, self.clamp_max
        ts = _substep_times(self.dt, self.num_steps)

        # eval prefers the forward-only kernel: the trainable one streams the
        # per-step residual tensor to HBM, which inference doesn't need
        if (self.fused_inference and ctx is not None and not ctx.train
                and jax.default_backend() == "tpu"):
            from ..ops.pallas_fused_channel import fused_channel_diffusion_fwd

            out = fused_channel_diffusion_fwd(
                u, params["alpha_base"], params["alpha_time_coeff"],
                params["beta_base"], params["beta_time_coeff"],
                params["channel_mixing"], dt=self.dt, dx=self.dx, dy=self.dy,
                num_steps=self.num_steps, ts=ts, splitting=self.splitting,
                eps=eps, cmax=cmax, tile_b=self.fused_tile_b)
            return out, state

        if self.fused and (self.fused_interpret
                           or jax.default_backend() == "tpu"):
            from ..ops.pallas_fused_channel_vjp import fused_channel_diffusion

            ts_tuple = _substep_times_tuple(self.dt, self.num_steps)
            out = fused_channel_diffusion(
                u, params["alpha_base"], params["alpha_time_coeff"],
                params["beta_base"], params["beta_time_coeff"],
                params["channel_mixing"], self.dt, self.dx, self.dy,
                self.num_steps, ts_tuple, self.splitting, eps, cmax,
                self.fused_train_tile_b, self.fused_interpret)
            return out, state

        dt_y = self.dt if self.splitting == "strang" else self.dt / 2

        if self.hoisted:
            strang = self.splitting == "strang"
            xs = _layer_operators(
                self, params, ts, self.dt, dt_y, self.dx, self.dy,
                smooth=False, eps=eps, cmax=cmax, strang=strang,
                train=ctx is not None and ctx.train)

            refine = self.hoisted_refine

            def step(u, ops):
                u = self._mix(params, u)
                u = apply_sweep(ops[0], u, refine=refine)
                u = apply_sweep_y(ops[1], u, refine=refine)
                if strang:
                    u = apply_sweep(ops[2], u, refine=refine)
                return u, None

            if self.remat:
                step = jax.checkpoint(step)
            u, _ = lax.scan(step, u, xs, unroll=HOISTED_SCAN_UNROLL)
            return u, state

        def step(u, t3):
            u = self._mix(params, u)
            alpha = _coeff_at(params["alpha_base"], params["alpha_time_coeff"],
                              t3[0], eps, cmax)
            u = sweep_x(u, alpha, self.dt / 2, self.dx, smooth=False, eps=eps)
            beta = _coeff_at(params["beta_base"], params["beta_time_coeff"],
                             t3[1], eps, cmax)
            u = sweep_y(u, beta, dt_y, self.dy, smooth=False, eps=eps)
            if self.splitting == "strang":
                alpha = _coeff_at(params["alpha_base"],
                                  params["alpha_time_coeff"], t3[2], eps, cmax)
                u = sweep_x(u, alpha, self.dt / 2, self.dx, smooth=False, eps=eps)
            return u, None

        if self.remat:
            step = jax.checkpoint(step)
        u, _ = lax.scan(step, u, ts)
        return u, state
