"""Honest per-preset train-step timing (the PERF.md per-model table).

Protocol: N steps chained inside one jitted lax.fori_loop (single dispatch),
synced by a forced device→host value fetch (axon's block_until_ready can
return early), min over samples.

Usage: python tools/bench_presets.py [--steps 100] [--presets mnist ...]
"""

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

AMP = False  # --amp: hoisted-bf16 layers + bf16 dense ops + matinv_bf16


def bench_preset(name, n_steps, samples=3, batch=None):
    from cnn_pde_tpu.data import SYNTHETIC_SPECS, build_augment_fn
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset(name)
    channels, size, classes = SYNTHETIC_SPECS[preset.dataset]
    bs = batch or preset.batch_size
    model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    if AMP:
        from cnn_pde_tpu.pde import enable_amp

        enable_amp(model)
    trainer = Trainer(model, preset.make_train_config(batch_size=bs),
                      preset.make_schedule(100),
                      augment_fn=build_augment_fn(preset.augment))
    state = trainer.init_state(jax.random.PRNGKey(0), None)
    raw = trainer._make_train_step(state.params).raw
    g = np.random.default_rng(0)
    images = jnp.asarray(g.random((bs, channels, size, size)).astype(np.float32))
    labels = jnp.asarray(g.integers(0, classes, bs).astype(np.int32))
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def run_n(n, p, m, o):
        def body(i, carry):
            p, m, o = carry
            p, m, o, loss, acc = raw(p, m, o, i, images, labels, rng)
            return (p, m, o)

        return jax.lax.fori_loop(0, n, body, (p, m, o))

    def sync(tree):
        return float(jnp.sum(jax.tree_util.tree_leaves(tree)[0]))

    out = run_n(3, state.params, state.model_state, state.opt_state)
    sync(out)
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        out = run_n(n_steps, *out)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return {"batch_size": bs, "ms_per_step": round(best * 1000, 2),
            "images_per_sec": round(bs / best)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--presets", nargs="*", default=None)
    ap.add_argument("--amp", action="store_true",
                    help="pde.enable_amp: bf16 solves + bf16 convs/Ruthotto")
    ap.add_argument("--batch-sizes", type=int, nargs="*", default=None,
                    help="override the preset batch size; one row per value "
                         "(batch-frontier mode, e.g. --batch-sizes 32 64 128)")
    args = ap.parse_args()
    if args.amp:
        global AMP
        AMP = True

    from cnn_pde_tpu.utils.config import PRESETS

    names = args.presets or list(PRESETS)
    results = {}
    for name in names:
        n = args.steps
        if name == "tiny_imagenet":
            n = min(n, 30)  # heavier model
        for bs in (args.batch_sizes or [None]):
            r = bench_preset(name, n, batch=bs)
            results[f"{name}@{r['batch_size']}" if args.batch_sizes else name] = r
            print(f"{name}: {r['ms_per_step']} ms/step (bs {r['batch_size']}) "
                  f"-> {r['images_per_sec']} img/s")
    print(json.dumps(results))
    from perf_record import record

    print("record:", record("bench_presets", results,
                            extra={"amp": AMP, "steps": args.steps}))


if __name__ == "__main__":
    main()
