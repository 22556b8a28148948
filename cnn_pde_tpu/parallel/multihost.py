"""Multi-host bring-up (SURVEY.md §2.6 item 3).

On a TPU pod slice, call :func:`initialize` once per process before any other
JAX work; afterwards ``jax.devices()`` spans all hosts and every construct in
this package (meshes, DP shardings, shard_map spatial ops) works unchanged —
XLA routes intra-slice collectives over ICI and inter-slice over DCN.
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize", "is_multihost", "local_batch_slice"]


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize with TPU auto-detection.

    On Cloud TPU the three arguments are discovered from the environment;
    pass them explicitly on other fabrics.  No-op when already initialized or
    when running single-process.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process / no coordinator configured — fine for 1 host
        pass


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_batch_slice(global_batch: int):
    """(start, size) of this process's shard of a globally-sharded batch —
    hosts feed only their local slice under jit with sharded inputs."""
    per = global_batch // jax.process_count()
    return jax.process_index() * per, per
