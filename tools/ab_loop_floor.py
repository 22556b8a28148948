#!/usr/bin/env python
"""Measure the per-iteration floor of a device-side loop on this TPU.

ab_merged_apply2 found every link formulation (1 op or 3, any layout) costs
~65-70 us/iteration — flagship sweep-chain accounting suggests the same
~70 us/step.  This harness separates per-iteration overhead from op cost:

  noop        carry * 0.999                      (pure loop floor)
  cast        bf16 round-trip on the carry       (cast passes only)
  one_sweep   one production-form einsum apply
  two_sweep   two einsum applies
  four_sweep  four einsum applies

and each at several carry sizes, n=2000.  If noop ~= one_sweep ~= four_sweep,
the chain is iteration-overhead-bound and depth cuts inside one iteration
buy nothing — only cutting ITERATIONS (unroll) would.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench(name, link, u0, n=2000):
    @jax.jit
    def run(n, u):
        return lax.fori_loop(0, n, lambda i, u: link(u), u)

    run(jnp.int32(2), u0)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(jnp.int32(n), u0)
        float(jnp.sum(out))
        ts.append((time.perf_counter() - t0) / n)
    print(f"  {name:12s} {min(ts) * 1e6:8.2f} us/iter")


def main():
    rng = np.random.default_rng(0)
    for B, C, H in [(64, 3, 32), (8, 1, 16)]:
        W = H
        eye = np.broadcast_to(np.eye(W, dtype=np.float32), (C, H, W, W))
        X = jnp.asarray(eye + 0.01 * rng.standard_normal(
            (C, H, W, W)).astype(np.float32)).astype(jnp.bfloat16)
        u0 = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
        print(f"carry (B={B}, C={C}, H={H}, W={W})")

        def sweep(u):
            return jnp.einsum("chij,bchj->bchi", X, u.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

        bench("noop", lambda u: u * 0.999, u0)
        bench("cast", lambda u: u.astype(jnp.bfloat16).astype(jnp.float32),
              u0)
        bench("one_sweep", sweep, u0)
        bench("two_sweep", lambda u: sweep(sweep(u)), u0)
        bench("four_sweep", lambda u: sweep(sweep(sweep(sweep(u)))), u0)
        bench("noop(re)", lambda u: u * 0.999, u0)


if __name__ == "__main__":
    main()
