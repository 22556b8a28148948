"""Multi-chip training on one mesh: DP + tensor parallel + spatial sharding.

Run on a multi-chip host, or simulate one on CPU:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/04_multichip.py

(Under this repo's axon environment the in-process env var is ignored —
simulate via: python -c "import jax; jax.config.update('jax_platforms',
'cpu'); exec(open('examples/04_multichip.py').read())" with XLA_FLAGS set.)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import optax

from cnn_pde_tpu.models import CIFAR10PDENoConv
from cnn_pde_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from cnn_pde_tpu.train import build_optimizer

n = len(jax.devices())
print(f"{n} devices ({jax.default_backend()})")

# ('data','spatial','model') mesh; size-1 axes are free.  --tp / --dp on
# the train CLI build the same thing.
mesh = make_mesh(spatial=1, model=1)

model = CIFAR10PDENoConv()
params, state = model.init(jax.random.PRNGKey(0))
opt = build_optimizer(params, lambda s: 1e-3, clip_norm=1.0)
opt_state = opt.init(params)

step = make_dp_train_step(model, opt, mesh, label_smoothing=0.1)

rng = np.random.default_rng(0)
B = 8 * max(n, 1)
images = rng.random((B, 3, 32, 32)).astype(np.float32)
labels = rng.integers(0, 10, B).astype(np.int32)

# replicate weights, shard the batch over 'data' — XLA inserts the
# gradient all-reduce.  Both helpers are multi-process aware (multi-host:
# call parallel.initialize() first; each host then feeds only its rows).
p, s, o = (replicate(mesh, t) for t in (params, state, opt_state))
imgs_s, labels_s = shard_batch(mesh, (images, labels))

for i in range(3):
    p, s, o, loss = step(p, s, o, imgs_s, labels_s, jax.random.PRNGKey(i))
    print(f"step {i}: loss {float(loss):.4f} "
          f"(batch {B} over {mesh.shape['data']} data shards)")
