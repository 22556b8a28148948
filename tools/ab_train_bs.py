"""A/B the flagship train step across BATCH SIZES (one process, chained
fori_loop protocol, first candidate re-measured last to confirm a quiet
pool window) — the large-batch throughput frontier.

The reference trains this model at batch 64 (cifar10.py:407); bench.py
certifies bs 64 (primary) and the bs-512 AMP champion.  This harness asks
whether the frontier keeps climbing past 512: the PDE evolution's sweep
chain is batch-row-parallel (B*C rows per solve), so larger batches deepen
each sweep's work without adding sequential steps — until HBM traffic or
the augmentation/head tail stops scaling.

Chain lengths auto-scale so N * t_step stays >= ~20x the tunnel RTT
(PERF.md §chain-length: short chains understate fast variants 15-40%).

Usage: python tools/ab_train_bs.py [--batch-sizes 256 512 1024 2048]
                                   [--n 200] [--f32]
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


def bench_bs(batch_size, n, amp, samples=3):
    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset("cifar10_noconv")
    model = CIFAR10PDENoConv()
    if amp:
        from cnn_pde_tpu.pde import enable_amp

        enable_amp(model)
    trainer = Trainer(model,
                      preset.make_train_config(batch_size=batch_size),
                      preset.make_schedule(50_000 // batch_size),
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
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+",
                    default=[256, 512, 1024, 2048])
    ap.add_argument("--n", type=int, default=200,
                    help="chain length at bs 512 (scaled down for larger "
                    "batches so one sample stays ~O(1 s), up for smaller)")
    ap.add_argument("--f32", action="store_true",
                    help="exact-f32 solves instead of the AMP default")
    args = ap.parse_args()

    results = {}
    for bs in args.batch_sizes:
        n = max(50, int(args.n * 512 / bs))
        dt = bench_bs(bs, n, amp=not args.f32)
        results[f"bs{bs}"] = {"ms_per_step": round(dt * 1e3, 4),
                              "img_per_sec": round(bs / dt, 1), "n": n}
        print(f"bs {bs}: {dt * 1e3:.3f} ms/step = {bs / dt:,.0f} img/s "
              f"(n={n})", flush=True)
    # window check: re-measure the first batch size
    bs0 = args.batch_sizes[0]
    n0 = max(50, int(args.n * 512 / bs0))
    dt = bench_bs(bs0, n0, amp=not args.f32)
    results[f"bs{bs0}_recheck"] = {"ms_per_step": round(dt * 1e3, 4),
                                   "img_per_sec": round(bs0 / dt, 1)}
    print(f"bs {bs0} recheck: {dt * 1e3:.3f} ms/step", flush=True)
    print(json.dumps(results))
    from perf_record import record
    record("train_bs", {k: ({kk: vv for kk, vv in v.items() if kk != "n"}
                            if isinstance(v, dict) else v)
                        for k, v in results.items()},
           extra={"amp": not args.f32})


if __name__ == "__main__":
    main()
