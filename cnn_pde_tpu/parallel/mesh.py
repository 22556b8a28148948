"""Device-mesh construction and sharding helpers.

The reference is single-device (SURVEY.md §2.6); these are the first-class
TPU-native components replacing that gap: DP over ICI via batch sharding, and
spatial sharding for large feature maps (see spatial.py).

Multi-host bring-up: call ``jax.distributed.initialize()`` before using these
on a pod; everything below works identically (jax.devices() spans hosts).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "dp_shardings", "P", "NamedSharding"]


def make_mesh(data: Optional[int] = None, spatial: int = 1,
              devices=None) -> Mesh:
    """Mesh with ('data', 'spatial') axes.  data=None uses all devices / spatial.
    With spatial=1 this is a pure-DP mesh."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % spatial == 0, (n, spatial)
        data = n // spatial
    assert data * spatial <= n, (data, spatial, n)
    grid = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(grid, ("data", "spatial"))


def dp_shardings(mesh: Mesh):
    """(batch_sharding, replicated_sharding) for data-parallel jit: shard the
    leading batch axis over 'data', replicate params/state.  XLA inserts the
    gradient all-reduce (psum over ICI) automatically."""
    batch = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    return batch, replicated
