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
              model: int = 1, devices=None) -> Mesh:
    """Mesh with ('data', 'spatial', 'model') axes.  data=None uses all
    devices / (spatial·model).  With spatial=model=1 this is a pure-DP mesh;
    'model' is the tensor-parallel axis (see tensor_parallel.py).  Size-1
    axes are free: shard_map/PartitionSpec users that never name them see
    identical behavior."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % (spatial * model) == 0, (n, spatial, model)
        data = n // (spatial * model)
    assert data * spatial * model <= n, (data, spatial, model, n)
    grid = np.asarray(devices[: data * spatial * model]).reshape(
        data, spatial, model)
    return Mesh(grid, ("data", "spatial", "model"))


def dp_shardings(mesh: Mesh):
    """(batch_sharding, replicated_sharding) for data-parallel jit: shard the
    leading batch axis over 'data', replicate params/state.  XLA inserts the
    gradient all-reduce (psum over ICI) automatically."""
    batch = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    return batch, replicated
