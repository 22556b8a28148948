"""Attention gates used by the CIFAR models (M4, M9)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import Linear, Module, ReLU, Sequential, Sigmoid

__all__ = ["SpatialAttention", "NonConvSpatialAttention"]


class SpatialAttention(Module):
    """M4 (cifar10.py:215-244): learnable position embedding + global-avg-pooled
    channel MLP (C→2C→C) with sigmoid gate."""

    def __init__(self, channels, size):
        self.channels = channels
        self.size = size
        self.fc = Sequential([
            Linear(channels, channels * 2), ReLU(),
            Linear(channels * 2, channels), Sigmoid(),
        ])

    def init(self, key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.normal(k1, (1, self.channels, self.size, self.size)) * 0.1
        pfc, sfc = self.fc.init(k2)
        return {"pos_embed": pos, "fc": pfc}, {"fc": sfc}

    def apply(self, params, state, x, ctx):
        x_pos = x + params["pos_embed"]
        pooled = jnp.mean(x_pos, axis=(2, 3))  # adaptive_avg_pool2d(1) → (B, C)
        w, sfc = self.fc.apply(params["fc"], state["fc"], pooled, ctx)
        return x * w[:, :, None, None], {"fc": sfc}


class NonConvSpatialAttention(Module):
    """M9 (cifar_2version.py:305-329): full-feature MLP gate over the flattened
    (C·H·W) map, pos-embed scale 0.02."""

    def __init__(self, channels, spatial_size):
        self.channels = channels
        self.spatial_size = spatial_size
        d = channels * spatial_size * spatial_size
        self.feature_dim = d
        self.net = Sequential([
            Linear(d, d // 4), ReLU(),
            Linear(d // 4, d // 8), ReLU(),
            Linear(d // 8, d), Sigmoid(),
        ])

    def init(self, key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.normal(
            k1, (1, self.channels, self.spatial_size, self.spatial_size)) * 0.02
        pn, sn = self.net.init(k2)
        return {"pos_embed": pos, "net": pn}, {"net": sn}

    def apply(self, params, state, x, ctx):
        B = x.shape[0]
        flat = (x + params["pos_embed"]).reshape(B, -1)
        w, sn = self.net.apply(params["net"], state["net"], flat, ctx)
        return x * w.reshape(x.shape), {"net": sn}
