"""Branch parallelism (parallel/branch_parallel.py): the lockstep-stacked
extractor with its K(branch) axis sharded over 'model' must reproduce the
unsharded lockstep path (forward + grads) — the K axis is purely batched,
so sharding it is layout-only.  Runs on the 8-virtual-CPU mesh.

The reference is single-device (SURVEY.md §2.6); this subsystem is
framework-added on top of the lockstep study (cifar10.py:248-282 is the
sequential counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_pde_tpu.models.cifar10_noconv import CIFAR10PDENoConv
from cnn_pde_tpu.nn.core import Ctx
from cnn_pde_tpu.parallel import enable_branch_parallel, make_mesh


def _perturbed(params, key):
    return jax.tree_util.tree_map(
        lambda a: a + 0.02 * jax.random.normal(
            jax.random.fold_in(key, a.size), a.shape), params)


def test_branch_parallel_matches_lockstep(rng, key):
    x = jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32))
    m_ref, m_bp = CIFAR10PDENoConv(), CIFAR10PDENoConv()
    m_ref.extractor.lockstep_hoisted = True
    mesh = make_mesh(data=2, model=3)  # uses 6 of the 8 devices
    assert enable_branch_parallel(m_bp, mesh) == 1
    params, state = m_ref.init(key)
    params = _perturbed(params, key)

    def feats(m, p):
        f, _ = m.extractor.apply(p["feature_extractor"],
                                 state["feature_extractor"], x,
                                 Ctx(train=False))
        return f

    # no mesh context needed: the constraint's NamedSharding carries it
    f_bp = jax.jit(lambda p: feats(m_bp, p))(params)
    np.testing.assert_allclose(np.asarray(f_bp),
                               np.asarray(feats(m_ref, params)),
                               rtol=0, atol=2e-5)

    g_ref = jax.grad(lambda p: jnp.sum(feats(m_ref, p) ** 2))(params)
    g_bp = jax.jit(jax.grad(lambda p: jnp.sum(feats(m_bp, p) ** 2)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_bp)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=0, atol=2e-5)


def test_branch_parallel_state_is_sharded(rng, key):
    """The stacked state inside the jitted forward must actually carry the
    branch sharding (not silently replicate): check the compiled HLO keeps
    a K-sharded intermediate by inspecting the output sharding of a probe
    that returns the stacked features."""
    from cnn_pde_tpu.pde.fused_multiscale import hoisted_lockstep_evolve
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=2, model=3)
    m = CIFAR10PDENoConv()
    params, _ = m.init(key)
    bp = params["feature_extractor"]
    x = jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32))
    sharding = NamedSharding(mesh, P(None, "model"))
    scales = m.extractor._SCALES

    def run(p, x):
        return hoisted_lockstep_evolve(
            x, [p[f"pde{i+1}"] for i in range(3)],
            dts=[s["dt"] for s in scales],
            steps_list=[s["num_steps"] for s in scales],
            dxs=[s["dx"] for s in scales], dys=[s["dy"] for s in scales],
            branch_sharding=sharding)

    out = jax.jit(run)(bp, x)
    assert out.shape == (4, 3, 3, 32, 32)
    # dim 1 (K) is split over 'model': per-device shards carry 1 branch
    shard_k = {s.data.shape[1] for s in out.addressable_shards}
    assert shard_k == {1}, shard_k
