"""Train a preset end-to-end with the library API (the CLI-free route).

Equivalent CLI: ``python -m cnn_pde_tpu.train --preset mnist --synthetic``.
Runs on any backend; pass ``--platform cpu`` semantics by setting
JAX_PLATFORMS before jax import (see CLAUDE.md) or just run on the TPU.

Usage: python examples/01_train_preset.py [preset] [epochs]
"""

import sys

import jax

sys.path.insert(0, ".")  # run from the repo root

from cnn_pde_tpu.data import build_augment_fn, load_dataset
from cnn_pde_tpu.models import MODEL_REGISTRY
from cnn_pde_tpu.train import Trainer
from cnn_pde_tpu.utils import get_preset, model_summary

preset = get_preset(sys.argv[1] if len(sys.argv) > 1 else "mnist")
epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

# synthetic fallback fixture (deterministic); point data_dir at real files
# (idx/pickle/mat layouts, MIGRATION.md §2) to train for real
dataset = load_dataset(preset.dataset, "/nonexistent", synthetic_ok=True)

model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
summ = model_summary(model, (preset.batch_size,) + dataset.train_images.shape[1:])
print(f"{preset.name}: {summ['total_params']:,} params "
      f"({summ['pde_params']:,} in PDE groups) -> {summ['output_shape']}")

steps = dataset.steps_for_batch(preset.batch_size)
# device_epoch: the whole epoch runs as ONE device dispatch (same
# shuffle/rng streams as the host loop) — essential over a remote-tunnel
# device where per-batch dispatches pay ~30 ms RTT each (CLAUDE.md)
trainer = Trainer(model,
                  preset.make_train_config(epochs=epochs,
                                           device_epoch=True),
                  preset.make_schedule(steps),
                  augment_fn=build_augment_fn(preset.augment))
state = trainer.init_state(jax.random.PRNGKey(0), None)
result = trainer.fit(state, dataset)
print(f"best test acc: {result['best_acc']:.2f}%")
