"""A/B: 3 separate per-branch W8A8 int8 evolution matmuls vs ONE concatenated
(D, 3D) matmul for the flagship's multi-scale extractor.

All three linearized branches apply to the SAME (B, D) input (the extractor
feeds x to every scale — models/cifar10_noconv.py::MultiScaleExtractor), so
their (D, D) int8 matrices can concatenate column-wise into one (D, 3D)
matrix: one dynamic activation-quantization pass instead of three (identical
per-row scales by construction) and one MXU matmul instead of three.

Protocol (CLAUDE.md): one process, N iterations chained in one jitted
fori_loop, device->host value fetch as the sync point, min over samples,
A/B back-to-back, first candidate re-measured last to detect window drift.

Usage: python tools/ab_concat_int8.py [--n 2000] [--batch-sizes 64 512]
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
from jax import lax

D = 3072  # flagship C*H*W = 3*32*32
K = 3     # branches


def quant_rows(x):
    r = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-30) / 127.0
    xq = jnp.clip(jnp.round(x / r[:, None]), -127, 127).astype(jnp.int8)
    return xq, r


def separate(x, qs, scales):
    outs = []
    for q, s in zip(qs, scales):
        xq, r = quant_rows(x)  # the model quantizes per layer entry
        acc = lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        outs.append(acc.astype(jnp.float32) * r[:, None] * s[None, :])
    return sum(outs)


def fused(x, qcat, scat):
    xq, r = quant_rows(x)  # ONE quantization pass
    acc = lax.dot_general(xq, qcat, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * r[:, None] * scat[None, :]
    return out.reshape(x.shape[0], K, D).sum(axis=1)


def bench(fn, x, n, samples=3):
    @jax.jit
    def run_n(x):
        def body(i, x):
            return x + 1e-12 * fn(x)
        return lax.fori_loop(0, n, body, x)

    out = run_n(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        out = run_n(x)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3  # ms per iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[64, 512])
    args = ap.parse_args()

    g = np.random.default_rng(0)
    qs = [jnp.asarray(g.integers(-127, 128, (D, D)).astype(np.int8))
          for _ in range(K)]
    scales = [jnp.asarray(g.random(D).astype(np.float32) * 1e-2)
              for _ in range(K)]
    qcat = jnp.concatenate(qs, axis=1)
    scat = jnp.concatenate(scales)

    # equivalence first: fused == separate (same math, one quant pass)
    x0 = jnp.asarray(g.standard_normal((8, D)).astype(np.float32))
    a = separate(x0, qs, scales)
    b = fused(x0, qcat, scat)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    print(f"equivalence: max rel |d| = {err:.2e}")
    assert err < 1e-5, err

    results = {}
    for bs in args.batch_sizes:
        x = jnp.asarray(g.standard_normal((bs, D)).astype(np.float32))
        sep = bench(lambda x: separate(x, qs, scales), x, args.n)
        fus = bench(lambda x: fused(x, qcat, scat), x, args.n)
        sep2 = bench(lambda x: separate(x, qs, scales), x, args.n)  # drift
        results[f"bs{bs}"] = {"separate_ms": round(sep, 4),
                              "fused_ms": round(fus, 4),
                              "separate_recheck_ms": round(sep2, 4),
                              "speedup": round(sep / fus, 3)}
        print(f"bs {bs}: separate {sep:.4f} ms | fused {fus:.4f} ms "
              f"| recheck {sep2:.4f} | speedup {sep / fus:.2f}x")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
