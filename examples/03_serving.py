"""Production serving walk-through: linearize, quantize, export, predict.

The serving ladder (PERF.md §linearized): jit predict → frozen-params
linearization (the whole PDE evolution as ONE matmul per branch) → int8
W8A8 matrices (the measured champion) → StableHLO export for deployment
without the model-building code.

Usage: python examples/03_serving.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from cnn_pde_tpu.models import CIFAR10PDENoConv
from cnn_pde_tpu.serve import (
    clear_linear_cache,
    export_model,
    linearize_pde_layers,
    load_exported,
    make_predict_fn,
)

model = CIFAR10PDENoConv()
params, state = model.init(jax.random.PRNGKey(0))  # or restore a checkpoint
x = jnp.asarray(np.random.default_rng(0).random((8, 3, 32, 32), np.float32))

# 1. plain jit'd predict (exact f32, sequential PDE evolution)
predict = make_predict_fn(model, params, state, output="labels")
ref = np.asarray(predict(x))
print("sequential predictions:", ref)

# 2. linearized + int8-quantized serving (W8A8; ~1% logit error, labels
#    agree — the frozen-params champion).  dtype=None for exact f32,
#    jnp.bfloat16 for AMP grade.
n = linearize_pde_layers(model, params, state, x[:1], dtype=jnp.int8)
fast = make_predict_fn(model, params, state, output="labels")
out = np.asarray(fast(x))
print(f"linearized {n} PDE branches; int8 predictions:", out)
assert (out == ref).all()

# 3. export the (still-linearized) forward as StableHLO and reload it
#    without any cnn_pde_tpu code in the loop
blob = export_model(model, params, state, x)
reloaded = load_exported(blob)
print("exported", len(blob) // 1024, "KiB; reloaded logits shape",
      reloaded(x).shape)

clear_linear_cache(model)  # unpin before any further training
