"""Branch parallelism: shard the MultiScaleExtractor's K independent PDE
branches over a mesh axis.

The flagship extractor (cifar10.py:248-282 counterpart,
models/cifar10_noconv.py) evolves 3 independent Strang branches whose
single-device forward pays 51 sequential sweeps (17 step-triples).  The
lockstep formulation (pde/fused_multiscale.py::hoisted_lockstep_evolve)
stacks them into (B, K, C, H, W) state evolved over max(steps)=8 uniform
step-triples; K is purely a batch axis throughout (channel mixing reduces
over C, sweeps over H/W — branches never interact), so sharding K over a
mesh axis is pure GSPMD with ZERO collectives inside the evolution: each
device runs only its branches' 24 stacked sweeps (vs 51 sequential), and
the one all-gather of the (B, K, C, H, W) result happens where the
attention/combine stage reads all branches.

Single-chip the lockstep stacking is a measured LOSS (PERF.md §lockstep:
the padded stack does ~1.4x the sweep work); branch parallelism is the
multi-chip regime where that padding buys a ~2x cut in per-device
sequential depth.  Composes with data parallelism (batch over 'data',
branches over 'model') on the standard 3-axis mesh.
"""

from __future__ import annotations

from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.cifar10_noconv import MultiScaleExtractor
from ..pde.amp import iter_modules

__all__ = ["enable_branch_parallel"]


def enable_branch_parallel(model, mesh, *, axis="model"):
    """Switch every MultiScaleExtractor in ``model`` to the lockstep path
    with its stacked branch axis sharded over ``mesh``'s ``axis``.  Returns
    the number of extractors switched.  Parameter layout is untouched
    (per-branch pde1/pde2/pde3 dicts), so checkpoints and the optimizer
    groups are unaffected."""
    sharding = NamedSharding(mesh, P(None, axis))
    n = 0
    for ext in iter_modules(model, MultiScaleExtractor):
        ext.branch_sharding = sharding
        n += 1
    return n
