"""Ruthotto–Haber PDE-motivated blocks (P6-P8) — cifar_2version.py:190-258.

SymmetricLayer computes F_sym(Y) = −σ(BN(K·Y))·K on flattened (B, C·H·W)
features; the reference's K is nn.Linear(bias=False) initialised ≈identity, and
its output projection multiplies by K.weight itself (cifar_2version.py:220),
i.e. with our (in, out)-layout kernel w = K.weightᵀ:
    F_sym(Y) = −σ(BN(Y @ w)) @ wᵀ.

ParabolicBlock: forward-Euler heat steps  Y ← Y + dt·F_sym(Y).
HamiltonianBlock: symplectic Verlet two-field integrator
    Y ← Y + dt·(−F_Y(Z));  Z ← Z − dt·F_Z(Y),  Z₀ = 0.

These are dense 3072×3072 matmuls — pure MXU work under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.core import Module
from ..nn.layers import BatchNorm, Linear

__all__ = ["SymmetricLayer", "ParabolicBlock", "HamiltonianBlock"]


class SymmetricLayer(Module):
    def __init__(self, channels, spatial_size, activation="relu",
                 compute_dtype=jnp.float32):
        self.channels = channels
        self.spatial_size = spatial_size
        self.feature_dim = channels * spatial_size * spatial_size
        self.K = Linear(self.feature_dim, self.feature_dim, bias=False,
                        weight_init="eye_plus_noise")
        self.norm = BatchNorm(self.feature_dim)
        # Exact f32 by default, like every other layer on the parity
        # surface.  The HYBRID MODEL opts into bf16 operands for the K
        # matmuls (models/cifar10_hybrid.py): the reference trains that model
        # under AMP autocast (cifar_2version.py:503), and the step is
        # weight-traffic-bound (K is 3072² ≈ 37.7 MB f32, streamed ~20× per
        # step across the parabolic/Hamiltonian loops), so halving operand
        # bytes halves the dominant HBM cost.  Master params, BN statistics
        # and accumulation stay f32 either way.
        self.compute_dtype = compute_dtype
        if activation == "relu":
            self.act = jax.nn.relu
        elif activation == "tanh":
            self.act = jnp.tanh
        else:
            self.act = lambda x: x

    def init(self, key):
        k1, k2 = jax.random.split(key)
        pk, sk = self.K.init(k1)
        pn, sn = self.norm.init(k2)
        return {"K": pk, "norm": pn}, {"norm": sn}

    def apply(self, params, state, Y, ctx):
        B, C, H, W = Y.shape
        y = Y.reshape(B, -1)
        w = params["K"]["w"].astype(self.compute_dtype)  # CSE'd across steps
        ky = jnp.dot(y.astype(self.compute_dtype), w,
                     preferred_element_type=jnp.float32)
        ky, norm_state = self.norm.apply(params["norm"], state["norm"], ky, ctx)
        s = self.act(ky)
        out = -jnp.dot(s.astype(self.compute_dtype), w.T,
                       preferred_element_type=jnp.float32)
        return out.reshape(B, C, H, W), {"norm": norm_state}


class ParabolicBlock(Module):
    """∂_t Y = F_sym(Y), forward Euler (cifar_2version.py:225-238)."""

    def __init__(self, channels, spatial_size, num_steps=3, dt=1.0,
                 compute_dtype=jnp.float32):
        self.num_steps = num_steps
        self.dt = dt
        self.sym = SymmetricLayer(channels, spatial_size,
                                  compute_dtype=compute_dtype)

    def init(self, key):
        p, s = self.sym.init(key)
        return {"sym": p}, {"sym": s}

    def apply(self, params, state, Y, ctx):
        st = state["sym"]
        for _ in range(self.num_steps):
            F, st = self.sym.apply(params["sym"], st, Y, ctx)
            Y = Y + self.dt * F
        return Y, {"sym": st}


class HamiltonianBlock(Module):
    """Symplectic two-field integrator (cifar_2version.py:241-258)."""

    def __init__(self, channels, spatial_size, num_steps=3, dt=1.0,
                 compute_dtype=jnp.float32):
        self.num_steps = num_steps
        self.dt = dt
        self.F_Y = SymmetricLayer(channels, spatial_size,
                                  compute_dtype=compute_dtype)
        self.F_Z = SymmetricLayer(channels, spatial_size,
                                  compute_dtype=compute_dtype)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        py, sy = self.F_Y.init(k1)
        pz, sz = self.F_Z.init(k2)
        return {"F_Y": py, "F_Z": pz}, {"F_Y": sy, "F_Z": sz}

    def apply(self, params, state, Y, ctx):
        Z = jnp.zeros_like(Y)
        sy, sz = state["F_Y"], state["F_Z"]
        for _ in range(self.num_steps):
            FY, sy = self.F_Y.apply(params["F_Y"], sy, Z, ctx)
            Y = Y + self.dt * (-FY)
            FZ, sz = self.F_Z.apply(params["F_Z"], sz, Y, ctx)
            Z = Z - self.dt * FZ
        return Y, {"F_Y": sy, "F_Z": sz}
