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
from .spatial import ftcs_evolve_spatial

__all__ = ["SpatialFTCSClassifier"]


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
