#!/usr/bin/env python
"""Premise test for step-boundary operator merging in the hoisted AMP path.

The flagship's hoisted evolution applies, per step: mix (3x3 channel
broadcast multiply-reduce), X1 (per-(c,h) WxW operator matmul), Y, X2.
Adjacent triples [X2_k, mix_{k+1}, X1_{k+1}] are all linear and composable
offline into ONE (k,c,h,W,W) operator A = m[k,c] * X1_{k+1,h} @ X2_{k,h} —
3x the operator bytes but one op instead of three (state read/written once
instead of three times, sequential depth 3 -> 1).

This harness times the two formulations' FORWARD chains in isolation
(chained fori_loop, forced value fetch) to size the win before building the
trainable custom-VJP version.  Shapes = flagship branch: B=64, C=3, H=W=32.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400, help="chain links")
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--hw", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16",
                                                            "float32"])
    args = ap.parse_args()
    B, C, H = args.b, 3, args.hw
    W = H
    op_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    # near-identity operators so the chain stays finite
    def ops(shape):
        eye = np.broadcast_to(np.eye(W, dtype=np.float32), shape)
        return jnp.asarray(
            eye + 0.01 * rng.standard_normal(shape).astype(np.float32)
        ).astype(op_dtype)

    X1 = ops((C, H, W, W))
    X2 = ops((C, H, W, W))
    m = jnp.asarray(np.eye(C, dtype=np.float32)
                    + 0.01 * rng.standard_normal((C, C)).astype(np.float32))
    u0 = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))

    # merged operator: A[k,c,h] = m[k,c] * X1[k,h] @ X2[c,h]
    A = jnp.einsum("khij,chjl->kchil", X1.astype(jnp.float32),
                   X2.astype(jnp.float32))
    A = (m[:, :, None, None, None] * A).astype(op_dtype)

    def seq_link(u):
        # mix -> X1 -> X2 (three sequential ops, as the current path)
        u = jnp.sum(m[:, :, None, None] * u[:, None], axis=2)  # b k h w
        u = jnp.einsum("chij,bchj->bchi", X1.astype(jnp.float32), u,
                       preferred_element_type=jnp.float32) \
            if op_dtype == jnp.float32 else \
            jnp.einsum("chij,bchj->bchi", X1, u.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        u = jnp.einsum("chij,bchj->bchi", X2, u.astype(op_dtype),
                       preferred_element_type=jnp.float32)
        return u

    def merged_link(u):
        return jnp.einsum("kchil,bchl->bkhi", A, u.astype(op_dtype),
                          preferred_element_type=jnp.float32)

    def make_run(link):
        @jax.jit
        def run(n, u):
            return lax.fori_loop(0, n, lambda i, u: link(u) * 0.999, u)

        return run

    runs = {"sequential(mix,X1,X2)": make_run(seq_link),
            "merged(one A matmul)": make_run(merged_link)}

    for name, run in runs.items():
        run(jnp.int32(2), u0)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(jnp.int32(args.n), u0)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0) / args.n)
        print(f"{name:24s} {min(ts) * 1e6:8.2f} us/link")
    # quiet-window recheck of the first variant
    run = runs["sequential(mix,X1,X2)"]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(jnp.int32(args.n), u0)
        float(jnp.sum(out))
        ts.append((time.perf_counter() - t0) / args.n)
    print(f"{'sequential(recheck)':24s} {min(ts) * 1e6:8.2f} us/link")


if __name__ == "__main__":
    main()
