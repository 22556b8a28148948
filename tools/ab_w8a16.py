"""A/B: W8A16 (int8-stored weights dequantized into a bf16 MXU matmul, no
dynamic activation quantization) vs the existing serving grades (bf16
matrices, W8A8 int8) on the flagship's 3 linearized evolution matmuls.

Hypothesis: the measured small-batch int8 loss (bs-64 −8%, bs-1 −32% vs
bf16 — PERF.md §linearized-int8) is NOT activation-quant arithmetic (the
per-row pass is tiny next to 28 MB of matrices) but the int8 MXU mode's
tiling at small M / the int32→f32 rescale epilogue.  If so, streaming int8
weight bytes but running the matmul in bf16 (convert+scale fused into the
dot operand load) should combine int8's traffic with bf16's small-batch
matmul shape — winning the < 256 bucket.

Protocol (CLAUDE.md): one process, chained fori_loop, value-fetch sync,
min over samples, first candidate re-measured last for window drift.

Usage: python tools/ab_w8a16.py [--n 2000] [--batch-sizes 1 64 256 1024]
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

D = 3072  # flagship C*H*W
K = 3     # branches


def apply_bf16(x, mats_bf16):
    out = 0.0
    for m in mats_bf16:
        out += lax.dot_general(x.astype(jnp.bfloat16), m,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return out


def apply_w8a8(x, qs, scales):
    out = 0.0
    for q, s in zip(qs, scales):
        r = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-30) / 127.0
        xq = jnp.clip(jnp.round(x / r[:, None]), -127, 127).astype(jnp.int8)
        acc = lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        out += acc.astype(jnp.float32) * r[:, None] * s[None, :]
    return out


def apply_w8a16(x, qs, scales):
    out = 0.0
    xb = x.astype(jnp.bfloat16)
    for q, s in zip(qs, scales):
        # dequantize into the dot's rhs: int8 bytes stream from HBM, the
        # convert*scale runs as the operand is staged (column scales fold
        # into the f32 epilogue to keep bf16 dynamic range safe)
        acc = lax.dot_general(xb, q.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        out += acc * s[None, :]
    return out


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
    return best / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--batch-sizes", type=int, nargs="+",
                    default=[1, 64, 256, 1024])
    args = ap.parse_args()

    g = np.random.default_rng(0)
    mats = [jnp.asarray((g.standard_normal((D, D)) * 1e-2).astype(np.float32))
            for _ in range(K)]
    scales = [jnp.maximum(jnp.max(jnp.abs(m), axis=0), 1e-30) / 127.0
              for m in mats]
    qs = [jnp.clip(jnp.round(m / s[None, :]), -127, 127).astype(jnp.int8)
          for m, s in zip(mats, scales)]
    mats_bf16 = [m.astype(jnp.bfloat16) for m in mats]

    # numerics sanity: W8A16 must be at least as accurate as W8A8 (same
    # weight rounding, NO activation rounding; bf16 accumulation of xb)
    x0 = jnp.asarray(g.standard_normal((8, D)).astype(np.float32))
    ref = sum(x0 @ m for m in mats)
    for name, out in [("bf16", apply_bf16(x0, mats_bf16)),
                      ("w8a8", apply_w8a8(x0, qs, scales)),
                      ("w8a16", apply_w8a16(x0, qs, scales))]:
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        print(f"rel err vs f32 [{name}]: {err:.2e}")

    results = {}
    for bs in args.batch_sizes:
        x = jnp.asarray(g.standard_normal((bs, D)).astype(np.float32))
        t_bf = bench(lambda x: apply_bf16(x, mats_bf16), x, args.n)
        t_88 = bench(lambda x: apply_w8a8(x, qs, scales), x, args.n)
        t_816 = bench(lambda x: apply_w8a16(x, qs, scales), x, args.n)
        t_bf2 = bench(lambda x: apply_bf16(x, mats_bf16), x, args.n)
        results[f"bs{bs}"] = {"bf16_ms": round(t_bf, 4),
                              "w8a8_ms": round(t_88, 4),
                              "w8a16_ms": round(t_816, 4),
                              "bf16_recheck_ms": round(t_bf2, 4)}
        print(f"bs {bs}: bf16 {t_bf:.4f} | w8a8 {t_88:.4f} | "
              f"w8a16 {t_816:.4f} | bf16-recheck {t_bf2:.4f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
