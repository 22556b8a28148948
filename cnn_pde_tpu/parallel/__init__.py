"""Parallelism: device meshes, data parallelism, spatial sharding."""

from .data_parallel import make_dp_train_step, replicate, shard_batch
from .dist_tridiag import (
    adi_strang_step_partitioned,
    sweep_sharded_axis,
    tridiag_solve_partitioned,
)
from .mesh import NamedSharding, P, dp_shardings, make_mesh
from .multihost import (global_batch_from_local, initialize,
                        is_multihost, local_batch_slice)
from .spatial import (adi_strang_step_spatial, ftcs_evolve_spatial,
                      laplacian_step_spatial)
from .spatial_model import SpatialFTCSClassifier, SpatialTinyImageNetClassifier
from .branch_parallel import enable_branch_parallel
from .tensor_parallel import (make_tp_train_step, replicated_like,
                              shard_pytree, tp_param_specs)

__all__ = [
    "adi_strang_step_partitioned",
    "sweep_sharded_axis",
    "tridiag_solve_partitioned",
    "make_dp_train_step",
    "replicate",
    "shard_batch",
    "NamedSharding",
    "P",
    "dp_shardings",
    "make_mesh",
    "initialize",
    "global_batch_from_local",
    "is_multihost",
    "local_batch_slice",
    "adi_strang_step_spatial",
    "ftcs_evolve_spatial",
    "laplacian_step_spatial",
    "SpatialFTCSClassifier",
    "SpatialTinyImageNetClassifier",
    "enable_branch_parallel",
    "make_tp_train_step",
    "replicated_like",
    "shard_pytree",
    "tp_param_specs",
]
