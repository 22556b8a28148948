"""Serving benchmark: inference latency + throughput on the flagship model.

Two regimes, matching how a server actually runs:

* steady-state THROUGHPUT — N batched predict calls chained in one jitted
  fori_loop (pure device rate, PERF.md protocol);
* per-request LATENCY — one dispatch per call, timed end-to-end from the
  host (includes the dispatch/tunnel round trip that a real request pays;
  the regime where the single-launch fused Pallas kernels were built to
  win).

`--amp` adds a third variant serving with bf16 hoisted-inverse ADI solves
(`pde.enable_amp`, the AMP analogue — see PERF.md), the
deployment configuration for throughput-critical serving where ~4e-3
relative output error is acceptable.

Usage: python tools/bench_serve.py [--batch-sizes 1 64 512] [--n 500] [--amp]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 64, 512])
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--latency-reps", type=int, default=50)
    ap.add_argument("--amp", action="store_true",
                    help="also measure the enable_amp serving variants "
                         "(hoisted-bf16 and frozen-operator-cached)")
    ap.add_argument("--variants", nargs="+", default=None,
                    help="explicit variant list (overrides --amp): any of "
                         "xla fused amp amp_cached linearized amp_linearized "
                         "linearized_bf16 linearized_int8 linearized_auto "
                         "(auto re-grades per batch size via "
                         "serve.select_linearize_grade)")
    ap.add_argument("--preset", default="cifar10_noconv",
                    help="serve any preset's model (default: the flagship)")
    args = ap.parse_args()

    from cnn_pde_tpu.data import SYNTHETIC_SPECS
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.ops.tridiag import set_default_impl
    from cnn_pde_tpu.serve import make_predict_fn
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset(args.preset)
    channels, size, _ = SYNTHETIC_SPECS[preset.dataset]

    variants = args.variants or (["xla", "fused"] + (
        ["amp", "amp_cached", "linearized", "amp_linearized"]
        if args.amp else []))
    results = {}
    for tag in variants:
        if tag == "fused" and jax.default_backend() != "tpu":
            # the fused Pallas path silently falls back to XLA off-TPU —
            # don't report the same code path under two labels
            print("skipping fused variant: not on TPU (would re-measure "
                  "the XLA path under a misleading label)", flush=True)
            continue
        amp = tag.startswith("amp")
        prev_impl = set_default_impl("matinv_bf16") if amp else None
        kwargs = dict(preset.model_kwargs)
        if tag == "fused":
            kwargs["fused_pde"] = True  # flagship-only option
        model = MODEL_REGISTRY[preset.model](**kwargs)
        if amp:  # hoisted-bf16 layers — the production AMP config
            from cnn_pde_tpu.pde import enable_amp

            enable_amp(model)
        params, state = model.init(jax.random.PRNGKey(0))
        sample = jnp.zeros((1, channels, size, size), jnp.float32)
        if tag == "amp_cached":
            # frozen-params serving: pin the sweep operators as constants
            from cnn_pde_tpu.serve import cache_hoisted_operators

            cache_hoisted_operators(model, params, state, sample)
        if "linearized" in tag:
            # frozen-params serving: the whole evolution as ONE matmul per
            # branch (serve.linearize_pde_layers).  'linearized' composes
            # from the exact-f32 sequential path; 'amp_linearized' from the
            # hoisted-bf16 one (same numerics grade as amp_cached);
            # 'linearized_bf16' stores the matrices in bf16 (halved HBM
            # traffic — the bs=1 cost), f32 accumulation;
            # 'linearized_int8' W8A8-quantizes them (int32 MXU accumulation).
            from cnn_pde_tpu.serve import linearize_pde_layers

            if not tag.endswith("auto"):  # auto re-grades per batch size
                n_lin = linearize_pde_layers(
                    model, params, state, sample,
                    dtype=(jnp.bfloat16 if tag.endswith("bf16")
                           else jnp.int8 if tag.endswith("int8") else None))
                print(f"{tag}: linearized {n_lin} PDE layers", flush=True)
        for bs in args.batch_sizes:
            if tag == "linearized_auto":
                # the --linearize auto path: grade per serving batch size
                # from the measured frontier (serve.select_linearize_grade)
                from cnn_pde_tpu.serve import (clear_linear_cache,
                                               linearize_pde_layers)

                clear_linear_cache(model)
                linearize_pde_layers(model, params, state, sample,
                                     dtype="auto", serve_batch_size=bs)
            g = np.random.default_rng(0)
            images = jnp.asarray(
                g.random((bs, channels, size, size)).astype(np.float32))
            predict = make_predict_fn(model, params, state, output="labels")

            # throughput: chained batches in one dispatch.  Thread the
            # weights through the outer jit as ARGUMENTS (predict.argtree)
            # — tracing predict inline would re-constify them, and
            # closure-constant weights measure up to 50% slower in this
            # regime (PERF.md §serving-args, tools/ab_serve_args.py)
            fwd, tree = predict.forward, predict.argtree

            @jax.jit
            def run_n(tree, x):
                def body(i, x):
                    lbl = fwd(*tree, x)
                    # fold the labels back in so the chain has a dependence
                    return x + 1e-12 * lbl[:, None, None, None].astype(x.dtype)
                return jax.lax.fori_loop(0, args.n, body, x)

            run_n_ = run_n
            run_n = lambda x: run_n_(tree, x)
            out = run_n(images)
            float(jnp.sum(out))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run_n(images)
                float(jnp.sum(out))
                best = min(best, time.perf_counter() - t0)
            thr_ms = best / args.n * 1e3

            # latency: one dispatch per request, host-timed
            lbl = predict(images)
            np.asarray(lbl)
            lats = []
            for _ in range(args.latency_reps):
                t0 = time.perf_counter()
                lbl = predict(images)
                np.asarray(lbl)  # value fetch = request completion
                lats.append(time.perf_counter() - t0)
            lats_ms = sorted(t * 1e3 for t in lats)
            med = lats_ms[len(lats_ms) // 2]

            results[f"{tag}_bs{bs}"] = {
                "throughput_ms_per_batch": round(thr_ms, 4),
                "images_per_sec": round(bs / thr_ms * 1e3, 1),
                "latency_ms_median": round(med, 3),
                "latency_ms_p90": round(lats_ms[int(len(lats_ms) * 0.9)], 3),
            }
            print(f"{tag} bs={bs}: {results[f'{tag}_bs{bs}']}", flush=True)
        if prev_impl is not None:
            set_default_impl(prev_impl)
    print(json.dumps(results))
    from perf_record import record

    print("record:", record("bench_serve", results,
                            extra={"preset": args.preset, "n": args.n}))


if __name__ == "__main__":
    main()
