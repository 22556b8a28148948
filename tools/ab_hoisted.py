"""A/B the hoisted-operator evolution (all sweep inverses precomputed in two
batched PCR calls, applied as MXU matmuls) on the full flagship train step —
f32-HIGHEST vs bf16 operators — against the per-sweep default.

Same protocol as ab_solver.py: one process, N steps chained in one jitted
fori_loop, real-value-fetch sync, first variant re-measured last.

Usage: python tools/ab_hoisted.py [--batch-size 64] [--n 300]
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


def bench_variant(variant, n, batch_size, samples=3):
    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.ops.tridiag import set_default_impl
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    impl = "matinv_bf16" if variant == "matinv_bf16" else "auto"
    prev = set_default_impl(impl)
    try:
        preset = get_preset("cifar10_noconv")
        model = CIFAR10PDENoConv()
        if variant.startswith("hoisted"):
            for pde in model.extractor.pdes:
                pde.hoisted = True
                if "bf16" in variant:
                    pde.operator_dtype = jnp.bfloat16
                # *_refine = the older two-matmul implicit-function apply;
                # default = single-matmul custom-VJP apply
                pde.hoisted_refine = variant.endswith("_refine")
        if variant.startswith("lockstep"):
            # all 3 branches in lockstep with identity-padded precomputed
            # operators: 24 sequential stacked-matmul sweeps instead of 51
            model.extractor.lockstep_hoisted = True
            if "bf16" in variant:
                for pde in model.extractor.pdes:
                    pde.operator_dtype = jnp.bfloat16
        trainer = Trainer(model,
                          preset.make_train_config(batch_size=batch_size),
                          preset.make_schedule(100),
                          augment_fn=build_augment_fn(preset.augment))
        state = trainer.init_state(jax.random.PRNGKey(0), None)
        raw = trainer._make_train_step(state.params).raw
        g = np.random.default_rng(0)
        images = jnp.asarray(
            g.random((batch_size, 3, 32, 32)).astype(np.float32))
        labels = jnp.asarray(g.integers(0, 10, batch_size).astype(np.int32))
        rng = jax.random.PRNGKey(1)

        @jax.jit
        def run(carry):
            def body(i, carry):
                p, m, o = carry
                p, m, o, loss, acc = raw(p, m, o, i, images, labels, rng)
                return (p, m, o)

            return jax.lax.fori_loop(0, n, body, carry)

        carry = (state.params, state.model_state, state.opt_state)
        out = run(carry)
        jax.block_until_ready(out)
        times = []
        for _ in range(samples):
            t0 = time.perf_counter()
            out = run(out)
            float(jnp.sum(jax.tree_util.tree_leaves(out[0])[0]))  # real sync
            times.append(time.perf_counter() - t0)
        return min(times) / n * 1e3
    finally:
        set_default_impl(prev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--variants", nargs="+",
                    default=["default", "hoisted_f32", "hoisted_bf16",
                             "lockstep_f32", "lockstep_bf16",
                             "matinv_bf16"])
    args = ap.parse_args()

    results = {}
    for v in args.variants:
        results[v] = round(bench_variant(v, args.n, args.batch_size), 4)
        print(f"{v}: {results[v]} ms/step", flush=True)
    # re-measure the first variant to confirm a quiet window
    first = args.variants[0]
    results[f"{first}_recheck"] = round(
        bench_variant(first, args.n, args.batch_size), 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
