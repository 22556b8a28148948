"""Test bootstrap: force JAX onto CPU with 8 virtual devices BEFORE jax imports.

Multi-device sharding logic (data parallel, spatial halo exchange, all_to_all ADI
axis swaps) is validated on a virtual CPU mesh — the standard JAX way to test
pjit/shard_map code without a TPU pod.  Numerics tests also run on CPU for speed
and determinism; TPU execution is exercised by bench.py / __graft_entry__.py.
"""

import os

# Force-set: the harness environment exports JAX_PLATFORMS=axon (the TPU
# tunnel), which must be overridden for the CPU test mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after env setup)

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
