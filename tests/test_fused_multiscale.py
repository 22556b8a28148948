"""Lockstep-fused multiscale evolution must match the sequential branches."""

import jax
import jax.numpy as jnp
import numpy as np

from cnn_pde_tpu.models.cifar10_noconv import MultiScaleExtractor
from cnn_pde_tpu.nn import Ctx
from cnn_pde_tpu.pde.fused_multiscale import fused_multiscale_evolve

SCALES = MultiScaleExtractor._SCALES


def test_fused_branches_match_sequential(rng, key):
    x = jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32))
    ext = MultiScaleExtractor(32, 3)
    params, state = ext.init(key)
    params["pde1"]["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.1)

    feats = []
    for i in range(3):
        f, _ = ext.pdes[i].apply(params[f"pde{i+1}"], {}, x, Ctx(False))
        feats.append(f)

    stacked = fused_multiscale_evolve(
        x, [params[f"pde{i+1}"] for i in range(3)],
        dts=[s["dt"] for s in SCALES],
        steps_list=[s["num_steps"] for s in SCALES],
        dxs=[s["dx"] for s in SCALES],
        dys=[s["dy"] for s in SCALES])
    for i in range(3):
        np.testing.assert_allclose(np.asarray(stacked[i]),
                                   np.asarray(feats[i]),
                                   rtol=1e-5, atol=1e-6)


def test_fused_extractor_and_model(rng, key):
    from cnn_pde_tpu.models import CIFAR10PDENoConv

    x = jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32))
    m_seq = CIFAR10PDENoConv()
    m_fused = CIFAR10PDENoConv(fused_multiscale=True)
    params, state = m_seq.init(key)
    y1, _ = m_seq(params, state, x)
    y2, _ = m_fused(params, state, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-4)

    # gradients flow through the masked lockstep evolution
    def loss(p):
        y, _ = m_fused(p, state, x)
        return jnp.sum(y**2)

    g = jax.grad(loss)(params)
    ga = np.asarray(g["feature_extractor"]["pde2"]["alpha_base"])
    assert np.isfinite(ga).all() and np.abs(ga).max() > 0


def test_hoisted_lockstep_matches_default(rng, key):
    """lockstep_hoisted=True (identity-padded precomputed operator stacks,
    24 sequential stacked-matmul sweeps) must match the default sequential
    extractor — forward and parameter gradients.  Measured SLOWER than the
    sequential hoisted path on v5e (PERF.md §lockstep) — kept as a tested
    study option."""
    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.nn import Ctx

    x = jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32))
    m_d, m_l = CIFAR10PDENoConv(), CIFAR10PDENoConv()
    m_l.extractor.lockstep_hoisted = True
    params, state = m_d.init(key)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * jax.random.normal(
            jax.random.fold_in(key, a.size), a.shape), params)

    def feats(m, p):
        f, _ = m.extractor.apply(p["feature_extractor"],
                                 state["feature_extractor"], x,
                                 Ctx(train=False))
        return f

    np.testing.assert_allclose(np.asarray(feats(m_l, params)),
                               np.asarray(feats(m_d, params)),
                               rtol=0, atol=1e-5)

    g_d = jax.grad(lambda p: jnp.sum(feats(m_d, p) ** 2))(params)
    g_l = jax.grad(lambda p: jnp.sum(feats(m_l, p) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_l)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=0, atol=2e-5)
