#!/usr/bin/env python
"""A/B: linearized-serving matrix matmul layouts on TPU.

PERF.md §linearized records bf16-STORED matrices as a 10x loss at bs 512,
attributed to a repacking/layout pass on the bf16 (D, D) RHS operand.  This
harness isolates the matmul and tests whether the loss is the bf16 RHS
LAYOUT (fixable by storing the matrix pre-transposed and contracting its
second dim) or bf16 RHS per se.

Variants (out[b, j] = sum_k u[b, k] * M[k, j]):
  f32_rhs    : dot(u, M_f32)                          — the production path
  bf16_rhs   : dot_general(u_bf16, M_bf16, k=dim0)    — the measured 10x loss
  bf16_rhsT  : dot_general(u_bf16, MT_bf16, k=dim1)   — MT stored (j, k)
  f32_rhsT   : dot_general(u, MT_f32, k=dim1)         — layout control at f32

Protocol: chained fori_loop, forced value fetch, one process (CLAUDE.md).
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
    float(jnp.sum(out))  # forced value fetch (axon block_until_ready trap)
    return (time.perf_counter() - t0) / int(n)


def make_run(apply_fn):
    @jax.jit
    def run(n, u, mat):
        def body(i, acc):
            # feed the iteration index in so XLA can't hoist the matmul
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
    matT = jnp.asarray(np.ascontiguousarray(np.asarray(mat).T))
    matT_bf16 = matT.astype(jnp.bfloat16)

    variants = {
        "f32_rhs": (make_run(lambda u, m: lax.dot(u, m)), mat),
        "bf16_rhs": (make_run(lambda u, m: lax.dot_general(
            u.astype(jnp.bfloat16), m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)), mat_bf16),
        "bf16_rhsT": (make_run(lambda u, m: lax.dot_general(
            u.astype(jnp.bfloat16), m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)), matT_bf16),
        "f32_rhsT": (make_run(lambda u, m: lax.dot_general(
            u, m, (((1,), (1,)), ((), ())))), matT),
    }

    for B in args.batches:
        u = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        print(f"-- B={B}")
        results = {}
        for name, (run, m) in variants.items():
            run(jnp.int32(2), u, m)  # compile+warmup
            results[name] = min(timed(run, jnp.int32(args.n), u, m)
                                for _ in range(3))
        # re-measure the first variant last to confirm a quiet window
        name0 = next(iter(variants))
        run, m = variants[name0]
        recheck = min(timed(run, jnp.int32(args.n), u, m) for _ in range(3))
        for name, t in results.items():
            print(f"  {name:10s} {t * 1e6:9.2f} us/apply")
        print(f"  {name0}(recheck) {recheck * 1e6:9.2f} us/apply")


if __name__ == "__main__":
    main()
