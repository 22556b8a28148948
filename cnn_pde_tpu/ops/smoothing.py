"""Coefficient smoothing (K6): 3-tap replicate-padded moving average along the
sweep axis.  Reference: ``smooth_coefficients`` at mnist_test.py:135-149,
fashion_mnist.py:133-147, SVHN.py:167-181 (the two CIFAR variants pass raw
coefficients — parity-relevant, see SURVEY.md §2.1).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["smooth3"]


def smooth3(coeffs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Moving average with kernel [1/3, 1/3, 1/3] and replicate (edge) padding,
    matching F.conv1d(pad 'replicate', ones(3)/3) at mnist_test.py:143-145."""
    c = jnp.moveaxis(coeffs, axis, -1)
    cp = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(1, 1)], mode="edge")
    k = jnp.asarray(1.0 / 3.0, dtype=coeffs.dtype)
    out = cp[..., :-2] * k + cp[..., 1:-1] * k + cp[..., 2:] * k
    return jnp.moveaxis(out, -1, axis)
