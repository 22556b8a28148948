#!/usr/bin/env python
"""Follow-up to ab_linmat_layout: closure-CONSTANT matrices vs arguments.

ab_linmat_layout (matrix passed as a jit ARGUMENT) measured bf16 RHS at
B=512 within 6% of f32 — it does NOT reproduce the 10x bf16 loss PERF.md
records for production linearized serving.  The production path embeds the
matrices as closure constants inside the jitted predict fn (they live on
`layer.linear_cache` and are captured, not passed).  This harness times the
same applies with the matrix (a) passed as an argument and (b) embedded as
a constant, f32 and bf16, to isolate whether constant-embedding is the
regression.

Protocol: chained fori_loop, forced value fetch, one process, first variant
re-measured last (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, n, *args):
    t0 = time.perf_counter()
    out = fn(n, *args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / int(n)


def apply_fn(u, m):
    if m.dtype == jnp.bfloat16:
        return lax.dot_general(u.astype(jnp.bfloat16), m,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return lax.dot(u, m)


def make_run_arg():
    @jax.jit
    def run(n, u, mat):
        def body(i, acc):
            return apply_fn(u + acc * 1e-20, mat)

        return lax.fori_loop(0, n, body, jnp.zeros_like(u))

    return run


def make_run_const(mat):
    @jax.jit
    def run(n, u):
        def body(i, acc):
            return apply_fn(u + acc * 1e-20, mat)

        return lax.fori_loop(0, n, body, jnp.zeros_like(u))

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=3072)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 64, 512])
    args = ap.parse_args()

    D = args.d
    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) / D)
    mat_bf16 = mat.astype(jnp.bfloat16)

    variants = {
        "f32_arg": (make_run_arg(), (mat,)),
        "bf16_arg": (make_run_arg(), (mat_bf16,)),
        "f32_const": (make_run_const(mat), ()),
        "bf16_const": (make_run_const(mat_bf16), ()),
    }

    for B in args.batches:
        u = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        print(f"-- B={B}", flush=True)
        results = {}
        for name, (run, extra) in variants.items():
            run(jnp.int32(2), u, *extra)
            results[name] = min(timed(run, jnp.int32(args.n), u, *extra)
                                for _ in range(3))
        name0 = next(iter(variants))
        run, extra = variants[name0]
        recheck = min(timed(run, jnp.int32(args.n), u, *extra)
                      for _ in range(3))
        for name, t in results.items():
            print(f"  {name:10s} {t * 1e6:9.2f} us/apply")
        print(f"  {name0}(recheck) {recheck * 1e6:9.2f} us/apply", flush=True)


if __name__ == "__main__":
    main()
