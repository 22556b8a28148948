#!/usr/bin/env python
"""A/B scan-unroll on the FTCS step loop, full emotion train step.

Companion to tools/ab_hoisted_unroll.py: the FTCS body (four concats +
elementwise) is light work near the ~13 µs/iter device-loop floor
(tools/ab_loop_floor.py), so unrolling the emotion preset's 10-step
evolution should delete loop overhead in the forward and the transposed
backward scan.  Same protocol: one process, N steps chained in one jitted
fori_loop, real-value-fetch sync, first variant re-measured last.

Usage: python tools/ab_ftcs_unroll.py [--batch-size 64] [--n 500]
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


def bench_variant(unroll, n, batch_size, samples=3):
    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.ops import stencil
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    prev = stencil.FTCS_SCAN_UNROLL
    stencil.FTCS_SCAN_UNROLL = unroll
    try:
        preset = get_preset("emotion")
        model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
        trainer = Trainer(model,
                          preset.make_train_config(batch_size=batch_size),
                          preset.make_schedule(100),
                          augment_fn=build_augment_fn(preset.augment))
        state = trainer.init_state(jax.random.PRNGKey(0), None)
        raw = trainer._make_train_step(state.params).raw
        g = np.random.default_rng(0)
        images = jnp.asarray(
            g.random((batch_size, 1, 48, 48)).astype(np.float32))
        labels = jnp.asarray(g.integers(0, 7, batch_size).astype(np.int32))
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
        stencil.FTCS_SCAN_UNROLL = prev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--unrolls", nargs="+", default=["1", "full"])
    args = ap.parse_args()

    def parse(u):
        return True if u == "full" else int(u)

    results = {}
    for u in args.unrolls:
        results[f"unroll_{u}"] = round(
            bench_variant(parse(u), args.n, args.batch_size), 4)
        print(f"unroll={u}: {results[f'unroll_{u}']} ms/step", flush=True)
    first = args.unrolls[0]
    results[f"unroll_{first}_recheck"] = round(
        bench_variant(parse(first), args.n, args.batch_size), 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
