"""A/B the tridiagonal solver impls on the full flagship train step (one
process, chained-fori_loop protocol, first candidate re-measured last to
confirm a quiet pool window).

Usage: python tools/ab_solver.py [--batch-size 64] [--n 300] [--impls pcr matinv]
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


def bench_impl(impl, n, batch_size, samples=3):
    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.ops.tridiag import set_default_impl
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    prev = set_default_impl(impl)
    try:
        preset = get_preset("cifar10_noconv")
        model = CIFAR10PDENoConv()
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
        out = run(carry)  # compile + warmup
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            out = run(carry)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            best = min(best, time.perf_counter() - t0)
        return best / n * 1e3
    finally:
        set_default_impl(prev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--impls", nargs="+", default=["pcr", "matinv"])
    args = ap.parse_args()

    results = {}
    for impl in args.impls:
        results[impl] = round(bench_impl(impl, args.n, args.batch_size), 4)
        print(f"{impl}: {results[impl]} ms/step", flush=True)
    # window check: re-measure the first candidate
    recheck = round(bench_impl(args.impls[0], args.n, args.batch_size), 4)
    results[f"{args.impls[0]}_recheck"] = recheck
    print(json.dumps(results))


if __name__ == "__main__":
    main()
