#!/usr/bin/env python
"""Layout study for the hoisted sweep apply (follow-up to ab_merged_apply).

Variants, all computing the same chain link on flagship shapes
(B=64, C=3, H=W=32), bf16 operands / f32 accumulation:

  seq_cur      state (B,C,H,W): mix + two einsum applies  (production form)
  merged_cur   state (B,C,H,W): one "kchil,bchl->bkhi" einsum (bad layout)
  seq_bmm      state (H,C,W,B): mix + two dot_general batched matmuls
  merged_bmm   state (H,CW,B):  ONE dot_general batched matmul over h
               with the (H, KI, CL) merged operator (no in-loop transposes)

The point: isolate per-op dispatch latency vs layout cost to size the real
win of a depth-cut before building the trainable version.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, C, H = 64, 3, 32
W = H


def bench(name, run, u0, n=400):
    run(jnp.int32(2), u0)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(jnp.int32(n), u0)
        float(jnp.sum(out))
        ts.append((time.perf_counter() - t0) / n)
    print(f"{name:14s} {min(ts) * 1e6:8.2f} us/link")


def main():
    rng = np.random.default_rng(0)

    def ops(shape):
        eye = np.broadcast_to(np.eye(W, dtype=np.float32), shape)
        return jnp.asarray(
            eye + 0.01 * rng.standard_normal(shape).astype(np.float32))

    X1 = ops((C, H, W, W))
    X2 = ops((C, H, W, W))
    m = jnp.asarray(np.eye(C, dtype=np.float32)
                    + 0.01 * rng.standard_normal((C, C)).astype(np.float32))
    u0 = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))

    A = jnp.einsum("khij,chjl->kchil", X1, X2)
    A = m[:, :, None, None, None] * A

    X1b, X2b, Ab = (t.astype(jnp.bfloat16) for t in (X1, X2, A))
    # (H, K*I, C*L) merged operator for the bmm layout
    A_bmm = jnp.transpose(A, (2, 0, 3, 1, 4)).reshape(H, C * W, C * W)
    A_bmmb = A_bmm.astype(jnp.bfloat16)
    # (H, C, W, W) per-sweep operators for the bmm layout
    X1h = jnp.transpose(X1, (1, 0, 2, 3)).astype(jnp.bfloat16)
    X2h = jnp.transpose(X2, (1, 0, 2, 3)).astype(jnp.bfloat16)

    def seq_cur(u):
        u = jnp.sum(m[:, :, None, None] * u[:, None], axis=2)
        u = jnp.einsum("chij,bchj->bchi", X1b, u.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        u = jnp.einsum("chij,bchj->bchi", X2b, u.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return u

    def merged_cur(u):
        return jnp.einsum("kchil,bchl->bkhi", Ab, u.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def seq_bmm(u):  # u: (H, C, W, B)
        u = jnp.sum(m[None, :, :, None, None] * u[:, None], axis=2)
        # X apply: batch (h, c), contract j: X (H,C,W,W) @ u (H,C,W,B)
        u = lax.dot_general(X1h, u.astype(jnp.bfloat16),
                            (((3,), (2,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.float32)
        u = lax.dot_general(X2h, u.astype(jnp.bfloat16),
                            (((3,), (2,)), ((0, 1), (0, 1))),
                            preferred_element_type=jnp.float32)
        return u

    def merged_bmm(u):  # u: (H, CW, B)
        return lax.dot_general(A_bmmb, u.astype(jnp.bfloat16),
                               (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)

    def make_run(link):
        @jax.jit
        def run(n, u):
            return lax.fori_loop(0, n, lambda i, u: link(u) * 0.999, u)

        return run

    u_bmm4 = jnp.transpose(u0, (2, 1, 3, 0))           # (H, C, W, B)
    u_bmm3 = u_bmm4.reshape(H, C * W, B)               # (H, CW, B)

    bench("seq_cur", make_run(seq_cur), u0)
    bench("merged_cur", make_run(merged_cur), u0)
    bench("seq_bmm", make_run(seq_bmm), u_bmm4)
    bench("merged_bmm", make_run(merged_bmm), u_bmm3)
    bench("seq_cur(re)", make_run(seq_cur), u0)


if __name__ == "__main__":
    main()
