"""A/B conv data layout on TPU: NCHW (torch-parity logical layout) vs NHWC
(channels-last) on a ResNet-18-shaped conv stack at tiny_imagenet sizes.

Motivation (PERF.md §tiny_imagenet): the backbone runs ~2x its bf16 conv
roofline and the early stages' NCHW minor dim (W=64/32/16) half-fills the
128-lane register width, while NHWC would put C (64..512) minor.  XLA:TPU
performs its own layout assignment, so the logical dimension_numbers may or
may not matter — this measures it.

Protocol: PERF.md — one process, N steps chained in one jitted fori_loop,
real-value-fetch sync, first variant re-measured last to confirm a quiet
window.

Usage: python tools/ab_conv_layout.py [--n 200] [--batch 32] [--bf16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from _bench import timed_loop

# (in_ch, out_ch, stride, spatial@entry) mirroring ResNet-18 on 64x64 with
# two 3x3 convs per stage entry
STAGES = [(3, 64, 1, 64), (64, 128, 2, 64), (128, 256, 2, 32),
          (256, 512, 2, 16)]


def make_params(key, nhwc):
    params = []
    for cin, cout, _, _ in STAGES:
        key, k1, k2 = jax.random.split(key, 3)
        w1 = jax.random.normal(k1, (cout, cin, 3, 3), jnp.float32) * 0.05
        w2 = jax.random.normal(k2, (cout, cout, 3, 3), jnp.float32) * 0.05
        if nhwc:  # OIHW -> HWIO
            w1, w2 = (jnp.transpose(w, (2, 3, 1, 0)) for w in (w1, w2))
        params.append((w1, w2))
    return params


def stack_forward(params, x, nhwc, bf16):
    dn = (("NHWC", "HWIO", "NHWC") if nhwc else ("NCHW", "OIHW", "NCHW"))
    for (w1, w2), (_, _, stride, _) in zip(params, STAGES):
        for w, s in ((w1, stride), (w2, 1)):
            lhs, rhs = (x, w)
            if bf16:
                # bf16 OUTPUT (autocast semantics, same as nn.Conv2d's AMP
                # path) — preferred_element_type=f32 breaks the transpose
                # rule's dtype agreement
                lhs, rhs = lhs.astype(jnp.bfloat16), rhs.astype(jnp.bfloat16)
            x = lax.conv_general_dilated(
                lhs, rhs, (s, s), "SAME", dimension_numbers=dn)
            x = jax.nn.relu(x.astype(jnp.float32))
    return x


def bench(nhwc, batch, n, bf16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 3, 64, 64)).astype(np.float32))
    if nhwc:
        x = jnp.transpose(x, (0, 2, 3, 1))
    params = make_params(jax.random.PRNGKey(0), nhwc)

    def loss(params, x):
        return jnp.sum(stack_forward(params, x, nhwc, bf16) ** 2)

    grad = jax.grad(loss)

    def body(i, carry):
        params, x = carry
        g = grad(params, x)
        new = jax.tree_util.tree_map(lambda p, gg: p - 1e-9 * gg, params, g)
        return new, x

    return timed_loop(body, (params, x), n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    args = ap.parse_args()

    res = {}
    res["nchw"] = bench(False, args.batch, args.n, args.bf16)
    res["nhwc"] = bench(True, args.batch, args.n, args.bf16)
    res["nchw_recheck"] = bench(False, args.batch, args.n, args.bf16)
    for k, v in res.items():
        print(f"{k}: {v:.3f} ms/step")
    print(json.dumps({k: round(v, 4) for k, v in res.items()}))


if __name__ == "__main__":
    main()
