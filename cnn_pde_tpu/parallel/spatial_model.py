"""A spatially-sharded classifier — the user-facing composition of the halo
FTCS + all_to_all ADI machinery (SURVEY.md §2.6 item 2: the CNN analogue of
sequence/context parallelism, for the larger 48×48 / 64×64 feature maps).

``SpatialFTCSClassifier`` is the emotion model with its PDE evolution running
under shard_map with H sharded over the mesh's 'spatial' axis while the batch
shards over 'data' — one jit'd train step exercises both axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import BatchNorm, Dropout, Flatten, Linear, Module, ReLU, Sequential
from ..pde.spectral import FourierFTCSLayer
from .spatial import ftcs_evolve_spatial, laplacian_step_spatial

__all__ = ["SpatialFTCSClassifier", "SpatialTinyImageNetClassifier"]


class SpatialFTCSClassifier(Module):
    """EmotionClassifier (M12) with the FTCS evolution spatially sharded.

    The classifier head matches emotion_recognition.py:170-195; the PDE
    evolution is mathematically identical to FourierFTCSLayer (validated
    equal in tests), just executed across the mesh's 'spatial' axis with
    per-step ppermute halo exchanges.
    """

    def __init__(self, mesh, img_size=48, num_classes=7, dropout_rate=0.3,
                 T=0.01, dt=0.001):
        self.mesh = mesh
        self.pde = FourierFTCSLayer(Nx=img_size, Ny=img_size, T=T, dt=dt)
        layers = [Flatten()]
        prev = img_size * img_size
        for h in (512, 256, 128):
            layers += [Linear(prev, h), BatchNorm(h), ReLU(),
                       Dropout(dropout_rate)]
            prev = h
        layers.append(Linear(prev, num_classes))
        self.head = Sequential(layers)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        pp, sp = self.pde.init(k1)
        ph, sh = self.head.init(k2)
        return {"diff": pp, "head": ph}, {"diff": sp, "head": sh}

    def apply(self, params, state, x, ctx):
        u = x[:, 0]
        alpha, beta = self.pde.coefficient_grids(params["diff"])
        u = ftcs_evolve_spatial(self.mesh, u, alpha, beta, self.pde.Nt)
        y, sh = self.head.apply(params["head"], state["head"], u[:, None], ctx)
        return y, {"diff": state["diff"], "head": sh}


class SpatialTinyImageNetClassifier(Module):
    """TinyImageNetClassifier (M13) with its 64×64 ResidualDiffusion
    front-end spatially sharded — the SURVEY §2.6 item-2 target map.

    The evolution replicates ResidualDiffusion.apply exactly (clamp α to
    [eps, 0.15], per-channel scaling, conv-Laplacian step, damped 0.1
    residual — tiny_imagenet.py:34-51) but runs the Laplacian under
    shard_map with H over the mesh's 'spatial' axis: one ppermute halo row
    per neighbor, zero rows at the global edges
    (spatial.laplacian_step_spatial).  The ResNet backbone is the SAME
    module path as the unsharded model (TinyImageNetClassifier.backbone),
    so params/state pytrees are interchangeable and logits match the
    unsharded model exactly (validated in tests/test_parallel.py and
    dryrun stage 7)."""

    def __init__(self, mesh, num_classes=200, dropout_rate=0.3):
        from ..models.tiny_imagenet import TinyImageNetClassifier

        self.mesh = mesh
        self.inner = TinyImageNetClassifier(num_classes=num_classes,
                                            use_pde=True,
                                            dropout_rate=dropout_rate)
        self.diff = self.inner.diff

    def init(self, key):
        return self.inner.init(key)

    def apply(self, params, state, x, ctx):
        d = self.diff
        u = x
        for _ in range(d.num_steps):
            alpha_eff = jnp.clip(params["diff"]["alpha_base"], d.eps,
                                 d.max_coeff)
            u_scaled = u * params["diff"]["channel_scaling"][None, :, None,
                                                             None]
            u_new = laplacian_step_spatial(self.mesh, u_scaled, alpha_eff,
                                           dt=d.dt)
            u = u + 0.1 * (u_new - u)
        y, ns = self.inner.backbone(params, state, u, ctx)
        ns["diff"] = state["diff"]
        return y, ns
