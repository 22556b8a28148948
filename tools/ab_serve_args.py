#!/usr/bin/env python
"""A/B: closure-constant vs argument-passed weights in linearized serving.

tools/ab_linmat_const.py (isolated (B,D)@(D,D) applies) measured that a
jit CLOSURE-CONSTANT matrix loses to the same matrix passed as an ARGUMENT
in the chained-loop protocol (B=64 f32: 40.5 vs 19.0 us/apply) and erases
the bf16 small-batch traffic win (B=1: const 64.6 vs arg 38.9 us).
Production `make_predict_fn` closes over params/state/linear_cache — all
constants.  This harness A/Bs the real flagship linearized serving path
end-to-end, both regimes (chained-loop throughput and per-dispatch
latency), with everything (params, state, matrices) either closed over or
passed as jit arguments, f32 and bf16 matrices.

Protocol: one process, forced value fetch, first variant re-measured last.

Usage: python tools/ab_serve_args.py [--batch-sizes 1 64 512] [--n 500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(predict_const, predict_args, argtree, images, n, lat_reps):
    """Returns (throughput ms/batch, median latency ms) for both forms."""
    out = {}
    for name, run1 in (("const", lambda x: predict_const(x)),
                       ("args", lambda x: predict_args(argtree, x))):
        if name == "const":
            @jax.jit
            def run_n(x):
                def body(i, x):
                    lbl = predict_const(x)
                    return x + 1e-12 * lbl[:, None, None, None].astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x)

            call_n = lambda x: run_n(x)
        else:
            @jax.jit
            def run_n(tree, x):
                def body(i, x):
                    lbl = predict_args(tree, x)
                    return x + 1e-12 * lbl[:, None, None, None].astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x)

            call_n = lambda x: run_n(argtree, x)

        o = call_n(images)
        float(jnp.sum(o))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = call_n(images)
            float(jnp.sum(o))
            best = min(best, time.perf_counter() - t0)
        thr_ms = best / n * 1e3

        lbl = run1(images)
        np.asarray(lbl)
        lats = []
        for _ in range(lat_reps):
            t0 = time.perf_counter()
            lbl = run1(images)
            np.asarray(lbl)
            lats.append(time.perf_counter() - t0)
        med = sorted(lats)[len(lats) // 2] * 1e3
        out[name] = (round(thr_ms, 4), round(med, 3))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 64, 512])
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--latency-reps", type=int, default=50)
    args = ap.parse_args()

    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.nn import Ctx
    from cnn_pde_tpu.pde.linearize import iter_linear_pde_layers
    from cnn_pde_tpu.serve import linearize_pde_layers

    results = {}
    for mat_dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        model = CIFAR10PDENoConv()
        params, state = model.init(jax.random.PRNGKey(0))
        sample = jnp.zeros((1, 3, 32, 32), jnp.float32)
        n_lin = linearize_pde_layers(model, params, state, sample,
                                     dtype=mat_dtype)
        layers = [lay for lay in iter_linear_pde_layers(model)
                  if getattr(lay, "linear_cache", None) is not None]
        assert len(layers) == n_lin == 3, (len(layers), n_lin)
        mats = [lay.linear_cache for lay in layers]
        argtree = (params, state, mats)

        def predict_const(x, model=model, params=params, state=state):
            logits, _ = model.apply(params, state, x, Ctx(train=False))
            return jnp.argmax(logits, axis=-1)

        def predict_args(tree, x, model=model, layers=layers):
            p, s, ms = tree
            saved = [lay.linear_cache for lay in layers]
            try:
                for lay, m in zip(layers, ms):
                    lay.linear_cache = m  # tracer during trace
                logits, _ = model.apply(p, s, x, Ctx(train=False))
            finally:
                for lay, m0 in zip(layers, saved):
                    lay.linear_cache = m0
            return jnp.argmax(logits, axis=-1)

        pc = jax.jit(predict_const)
        pa = jax.jit(predict_args)

        for bs in args.batch_sizes:
            g = np.random.default_rng(0)
            images = jnp.asarray(g.random((bs, 3, 32, 32)).astype(np.float32))
            # correctness guard: both forms agree
            np.testing.assert_array_equal(np.asarray(pc(images)),
                                          np.asarray(pa(argtree, images)))
            out = measure(pc, pa, argtree, images, args.n, args.latency_reps)
            for form, (thr, lat) in out.items():
                key = f"{tag}_{form}_bs{bs}"
                results[key] = {"thr_ms": thr, "lat_ms": lat}
                print(f"{key}: thr {thr} ms/batch, lat {lat} ms", flush=True)
    # window check: re-measure the first variant
    print(json.dumps(results))


if __name__ == "__main__":
    main()
