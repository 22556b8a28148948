"""Weight initializers with exact PyTorch-default semantics.

The reference relies on torch defaults plus two explicit schemes
(kaiming_normal_ at cifar10.py:310 / cifar_2version.py:362 and the
fan_out/normal(0.01) pair at tiny_imagenet.py:274-284); matching the init
distributions is part of accuracy parity within run-to-run noise.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "torch_linear_default",
    "torch_bias_default",
    "kaiming_normal",
    "kaiming_uniform_a5",
    "normal",
    "zeros",
    "ones",
]


def kaiming_uniform_a5(key, shape, fan_in, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) — the torch Linear/Conv2d
    default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# torch Linear/Conv default weight and bias share the same bound
torch_linear_default = kaiming_uniform_a5
torch_bias_default = kaiming_uniform_a5


def kaiming_normal(key, shape, fan, gain=math.sqrt(2.0), dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_: N(0, gain²/fan). Default torch call
    (a=0, fan_in, leaky_relu) ⇒ gain=sqrt(2)."""
    std = gain / math.sqrt(fan)
    return jax.random.normal(key, shape, dtype) * std


def normal(key, shape, std=0.01, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
