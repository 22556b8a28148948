"""A/B the dense-AMP extension (bf16-operand Linear/Conv2d/SymmetricLayer —
the autocast-coverage analogue) against the solver-only AMP surface and the
exact-f32 default, per preset, on the full train step.

Same protocol as ab_solver.py: one process, N steps chained in one jitted
fori_loop, real-value-fetch sync, first variant re-measured last to confirm
a quiet window.

Usage: python tools/ab_dense_amp.py [--n 200] [--presets tiny_imagenet ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(preset_name, variant, n, samples=3):
    from cnn_pde_tpu.data import SYNTHETIC_SPECS, build_augment_fn
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.ops.tridiag import set_default_impl
    from cnn_pde_tpu.pde import enable_amp
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset(preset_name)
    channels, size, classes = SYNTHETIC_SPECS[preset.dataset]
    bs = preset.batch_size
    model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    if variant == "amp_solver":
        enable_amp(model, dense=False)
    elif variant == "amp_dense":
        # the production configuration: enable_amp's dense surface is
        # Conv2d + SymmetricLayer (Linears excluded — measured loss)
        enable_amp(model, dense=True)
    elif variant == "amp_all_dense":
        # the historical "cast every dense op incl. Linear" variant the
        # PERF.md dense-AMP table compares against (svhn −3%, tiny −5%
        # vs conv-only) — kept reproducible here
        from cnn_pde_tpu.nn.layers import Linear
        from cnn_pde_tpu.pde.amp import iter_modules
        enable_amp(model, dense=True)
        for lay in iter_modules(model, Linear):
            lay.compute_dtype = jnp.bfloat16
    try:
        trainer = Trainer(model, preset.make_train_config(batch_size=bs),
                          preset.make_schedule(100),
                          augment_fn=build_augment_fn(preset.augment))
        state = trainer.init_state(jax.random.PRNGKey(0), None)
        raw = trainer._make_train_step(state.params).raw
        g = np.random.default_rng(0)
        images = jnp.asarray(
            g.random((bs, channels, size, size)).astype(np.float32))
        labels = jnp.asarray(g.integers(0, classes, bs).astype(np.int32))
        rng = jax.random.PRNGKey(1)

        @jax.jit
        def run(carry):
            def body(i, carry):
                p, m, o = carry
                p, m, o, loss, acc = raw(p, m, o, i, images, labels, rng)
                return (p, m, o)

            return jax.lax.fori_loop(0, n, body, carry)

        out = run((state.params, state.model_state, state.opt_state))
        float(jnp.sum(jax.tree_util.tree_leaves(out[0])[0]))
        times = []
        for _ in range(samples):
            t0 = time.perf_counter()
            out = run(out)
            float(jnp.sum(jax.tree_util.tree_leaves(out[0])[0]))
            times.append(time.perf_counter() - t0)
        return min(times) / n * 1e3
    finally:
        set_default_impl("auto")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--presets", nargs="*",
                    default=["tiny_imagenet", "cifar10_hybrid", "svhn",
                             "cifar10_noconv", "emotion"])
    ap.add_argument("--variants", nargs="*",
                    default=["f32", "amp_solver", "amp_dense",
                             "amp_all_dense"])
    args = ap.parse_args()

    results = {}
    for preset in args.presets:
        n = min(args.n, 60) if preset == "tiny_imagenet" else args.n
        row = {}
        for v in args.variants:
            row[v] = round(bench(preset, v, n), 4)
            print(f"{preset}/{v}: {row[v]} ms/step", flush=True)
        first = args.variants[0]
        row[f"{first}_recheck"] = round(bench(preset, first, n), 4)
        print(f"{preset}/{first}_recheck: {row[f'{first}_recheck']} ms/step",
              flush=True)
        results[preset] = row
    print(json.dumps(results))


if __name__ == "__main__":
    main()
