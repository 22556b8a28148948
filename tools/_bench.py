"""Shared timing protocol for the profiling tools (PERF.md methodology).

N iterations chained inside ONE jitted lax.fori_loop, synced by a forced
device->host value fetch (on the axon remote platform block_until_ready has
been observed to return before execution completes), min over samples.
"""

import time

import jax
import jax.numpy as jnp


def timed_loop(fn, init_carry, n, samples=3):
    """fn: (i, carry) -> carry, chained n times in one jitted dispatch.
    Returns ms per iteration (min over samples)."""

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, n, fn, carry)

    out = run(init_carry)  # compile + warmup
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        out = run(init_carry)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3
