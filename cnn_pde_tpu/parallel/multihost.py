"""Multi-host bring-up (SURVEY.md §2.6 item 3).

On a TPU pod slice, call :func:`initialize` once per process before any other
JAX work; afterwards ``jax.devices()`` spans all hosts and every construct in
this package (meshes, DP shardings, shard_map spatial ops) works unchanged —
XLA routes intra-slice collectives over ICI and inter-slice over DCN.
"""

from __future__ import annotations

import os
import sys

import jax

__all__ = ["initialize", "is_multihost", "local_batch_slice",
           "global_batch_from_local"]


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize with TPU auto-detection.

    On Cloud TPU the three arguments are discovered from the environment;
    pass them explicitly on other fabrics.  Returns the bring-up outcome:

    * ``"already_initialized"`` — a prior call (or the runtime) already
      brought the process group up; no-op.
    * ``"initialized"`` — bring-up succeeded.
    * ``"single_process"`` — no coordinator is configured anywhere
      (arguments and environment both empty): legitimately a 1-host run.

    A coordinator that IS configured but fails to connect is a genuine
    bring-up failure and the underlying error propagates — silently falling
    back to single-process there would train on 1/N of the data while
    appearing healthy.
    """
    # jax.distributed.is_initialized() is backend-free; jax.process_count()
    # would itself initialize the XLA backend, defeating the bring-up.
    if jax.distributed.is_initialized():
        return "already_initialized"
    configured = (coordinator_address is not None
                  or num_processes is not None
                  or process_id is not None
                  or any(v in os.environ for v in (
                      "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                      "CLOUD_TPU_TASK_ID", "TPU_WORKER_ID")))
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return "initialized"
    except RuntimeError:
        if "already" in str(sys.exc_info()[1]).lower():
            return "already_initialized"
        raise
    except ValueError:
        # jax raises ValueError when it cannot auto-detect a coordinator;
        # that is the expected single-host outcome ONLY when nothing was
        # configured — otherwise the configuration is wrong: propagate.
        if configured:
            raise
        return "single_process"


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_batch_slice(global_batch: int):
    """(start, size) of this process's shard of a globally-sharded batch —
    hosts feed only their local slice under jit with sharded inputs."""
    per = global_batch // jax.process_count()
    return jax.process_index() * per, per


def global_batch_from_local(mesh, local_tree, axis="data"):
    """Assemble globally-sharded batch arrays from each process's LOCAL
    slice (the multi-host data path: every host loads only
    ``local_batch_slice``'s rows, never the full global batch).

    Wraps ``jax.make_array_from_process_local_data``: each leaf's leading
    dim is this process's shard; the returned jax.Arrays have global shape
    ``num_processes * local`` rows, sharded over ``mesh``'s ``axis``, and
    feed directly into any jitted step that declares batch in_shardings
    (Trainer DP / make_dp_train_step / make_predict_fn(mesh=)).  The mesh
    must span all processes' devices with ``axis`` covering the batch dim.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    def make(x):
        x = np.asarray(x)
        spec = PartitionSpec(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(make, local_tree)
