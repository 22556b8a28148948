"""Experiment-sweep harness — the dx/dy comparison machinery (A5,
mnist_test.py:448-496), generalized: train a preset under several config
overrides and tabulate the results, with per-config error isolation."""

from __future__ import annotations

import traceback
from typing import Callable, Optional, Sequence

import jax

__all__ = ["compare_configs", "compare_spatial_discretizations", "format_table"]


def compare_configs(run_one: Callable[[dict], float],
                    configs: Sequence[dict],
                    descriptions: Optional[Sequence[str]] = None):
    """Run ``run_one(config) -> accuracy`` per config; failures record 0.0
    (mnist_test.py:485-487's try/except semantics)."""
    results = []
    for i, cfg in enumerate(configs):
        desc = descriptions[i] if descriptions else str(cfg)
        try:
            acc = float(run_one(cfg))
        except Exception:
            traceback.print_exc()
            acc = 0.0
        results.append({"config": cfg, "description": desc, "accuracy": acc})
    return results


def compare_spatial_discretizations(*, epochs=1, steps=None, synthetic=True,
                                    seed=0, verbose=False):
    """The reference's 4-config dx/dy sweep on the MNIST model
    (mnist_test.py:454-459)."""
    from ..data import build_augment_fn, load_dataset
    from ..models import MNISTClassifier
    from ..train import Trainer
    from ..utils.config import get_preset

    configs = [
        {"dx": 1.0, "dy": 1.0}, {"dx": 1.0, "dy": 0.5},
        {"dx": 0.5, "dy": 1.0}, {"dx": 2.0, "dy": 1.0},
    ]
    descriptions = ["Square grid (isotropic)", "Fine Y resolution",
                    "Fine X resolution", "Coarse X resolution"]

    preset = get_preset("mnist")
    dataset = load_dataset("mnist", "/nonexistent" if synthetic else "./data",
                           synthetic_ok=True)

    def run_one(cfg):
        model = MNISTClassifier(dx=cfg["dx"], dy=cfg["dy"])
        spe = dataset.steps_for_batch(preset.batch_size)
        trainer = Trainer(model,
                          preset.make_train_config(epochs=epochs, seed=seed),
                          preset.make_schedule(spe),
                          augment_fn=build_augment_fn(preset.augment))
        state = trainer.init_state(jax.random.PRNGKey(seed), None)
        for e in range(epochs):
            trainer.train_epoch(state, dataset, e, verbose=verbose)
        return trainer.evaluate(state, dataset)["acc"]

    return compare_configs(run_one, configs, descriptions)


def format_table(results):
    lines = [f"{'description':<28} {'accuracy':>9}", "-" * 39]
    for r in results:
        lines.append(f"{r['description']:<28} {r['accuracy']:>8.2f}%")
    return "\n".join(lines)
