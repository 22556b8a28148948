"""A/B the fused-level-pair PCR (impl 'pcr2', ops/tridiag.py::
tridiag_solve_pcr_fused) against the standard PCR — VERDICT r4 #5's
directed shot at the sweep-core roofline gap (measured core 0.571 of the
v5e HBM peak; PERF.md §roofline attributes the distance to the 5 small
sequential RHS passes).

Two measurements, one process, chained-fori_loop protocol, first candidate
re-measured last (window check):
  1. the ISOLATED sweep core at flagship shapes — one implicit x-sweep
     over the (192, 32, 32) f32 state (bench.py::measure_sweep_core's
     exact workload), where the RHS-pass halving must show if it exists;
  2. the full flagship train step (both directions of the ADI engine +
     backward), where the verdict actually matters.

Usage: python tools/ab_pcr_fused.py [--n 2000] [--n-step 300]
       [--platform cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(run, sync, n, samples=3):
    import jax
    import jax.numpy as jnp

    out = run()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(sync(out))[0]))
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        out = run()
        float(jnp.sum(jax.tree_util.tree_leaves(sync(out))[0]))
        best = min(best, time.perf_counter() - t0)
    return best / n


def bench_sweep_core(impl, n):
    """bench.py::measure_sweep_core's workload under the given impl."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_pde_tpu.ops.adi import sweep_x
    from cnn_pde_tpu.ops.tridiag import set_default_impl

    prev = set_default_impl(impl)
    try:
        g = np.random.default_rng(0)
        u0 = jnp.asarray(g.random((192, 32, 32)).astype(np.float32))
        alpha = jnp.asarray(g.random((32, 32)).astype(np.float32) + 0.5)

        @jax.jit
        def run_n(u):
            def body(i, u):
                return sweep_x(u, alpha, 0.001, 1.0, smooth=False, eps=1e-6)
            return jax.lax.fori_loop(0, n, body, u)

        dt = _timed(lambda: run_n(u0), lambda o: o, n)
        state_bytes = 192 * 32 * 32 * 4
        return {"us_per_sweep": dt * 1e6,
                "gbps_pcr_accounting": 2 * 5 * state_bytes / dt / 1e9}
    finally:
        set_default_impl(prev)


def bench_train_step(impl, n, batch_size=64):
    import jax
    import jax.numpy as jnp
    import numpy as np

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
        return _timed(lambda: run(carry), lambda o: o[0], n) * 1e3
    finally:
        set_default_impl(prev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000, help="sweep-core chain")
    ap.add_argument("--n-step", type=int, default=300, help="train-step chain")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    results = {}
    for impl in ("pcr", "pcr2"):
        r = bench_sweep_core(impl, args.n)
        results[f"core_{impl}_us"] = round(r["us_per_sweep"], 3)
        results[f"core_{impl}_gbps"] = round(r["gbps_pcr_accounting"], 1)
        print(f"sweep core {impl}: {r['us_per_sweep']:.2f} us "
              f"({r['gbps_pcr_accounting']:.1f} GB/s on the 10-pass "
              "accounting)", flush=True)
    for impl in ("pcr", "pcr2"):
        ms = bench_train_step(impl, args.n_step)
        results[f"step_{impl}_ms"] = round(ms, 4)
        print(f"train step {impl}: {ms:.3f} ms", flush=True)
    # window check: re-measure the first candidate's core
    r = bench_sweep_core("pcr", args.n)
    results["core_pcr_recheck_us"] = round(r["us_per_sweep"], 3)
    print(json.dumps(results))

    from perf_record import record
    record("ab_pcr_fused", results)


if __name__ == "__main__":
    main()
