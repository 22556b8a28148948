"""Golden-activation parity tests: each PDE layer vs the float64 numpy oracle
(per-step activation parity ≤ 1e-5, BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu import nn
from cnn_pde_tpu.pde import (
    ChannelCoupledDiffusion,
    FourierFTCSLayer,
    GrayscaleDiffusion,
    HamiltonianBlock,
    MixedChannelDiffusion,
    ParabolicBlock,
    ResidualDiffusion,
    SymmetricLayer,
)
from tests.golden import reference_numpy as ref

TOL = dict(rtol=1e-5, atol=1e-5)


def _np_params(params):
    return {k: np.asarray(v) for k, v in params.items()}


def test_grayscale_mnist_parity(rng, key):
    layer = GrayscaleDiffusion(size=28, dt=0.001, dx=1.0, dy=1.0, num_steps=10,
                               init_value=2.0)
    params, state = layer.init(key)
    # perturb so fields are non-trivial
    params["alpha_base"] = params["alpha_base"] + jnp.asarray(
        rng.standard_normal((28, 28)).astype(np.float32) * 0.3)
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((28, 28)).astype(np.float32) * 0.05)
    params["beta_time_coeff"] = jnp.asarray(
        rng.standard_normal((28, 28)).astype(np.float32) * 0.05)

    u = rng.random((4, 1, 28, 28)).astype(np.float32)
    out, _ = layer(params, state, jnp.asarray(u))
    golden = ref.grayscale_forward_np(u, _np_params(params), 0.001, 1.0, 1.0, 10)
    np.testing.assert_allclose(np.asarray(out), golden, **TOL)


def test_grayscale_fashion_parity(rng, key):
    """Fashion variant: dt=0.3, 4 steps, y-sweep reuses dx (fashion_mnist.py:63)."""
    layer = GrayscaleDiffusion(size=28, dt=0.3, dx=1.0, dy=1.0, num_steps=4,
                               init_value=1.8)
    params, state = layer.init(key)
    u = rng.random((2, 1, 28, 28)).astype(np.float32)
    out, _ = layer(params, state, jnp.asarray(u))
    golden = ref.grayscale_forward_np(u, _np_params(params), 0.3, 1.0, 1.0, 4)
    np.testing.assert_allclose(np.asarray(out), golden, **TOL)


def test_svhn_channel_coupled_parity(rng, key):
    layer = ChannelCoupledDiffusion(size=16, channels=3, dt=0.01, num_steps=4)
    params, state = layer.init(key)
    u = rng.random((2, 3, 16, 16)).astype(np.float32)
    out, _ = layer(params, state, jnp.asarray(u))
    golden = ref.svhn_forward_np(u, _np_params(params), 0.01, 1.0, 4)
    np.testing.assert_allclose(np.asarray(out), golden, **TOL)


@pytest.mark.parametrize("splitting", ["strang", "lie"])
def test_mixed_channel_parity(rng, key, splitting):
    layer = MixedChannelDiffusion(size=16, channels=3, dt=0.002, num_steps=5,
                                  splitting=splitting)
    params, state = layer.init(key)
    params["alpha_time_coeff"] = jnp.asarray(
        rng.standard_normal((3, 16, 16)).astype(np.float32) * 0.1)
    u = rng.random((2, 3, 16, 16)).astype(np.float32)
    out, _ = layer(params, state, jnp.asarray(u))
    golden = ref.mixed_forward_np(u, _np_params(params), 0.002, 1.0, 1.0, 5,
                                  splitting)
    np.testing.assert_allclose(np.asarray(out), golden, **TOL)


def test_fourier_ftcs_single_step_parity(rng, key):
    """Per-step parity at 1e-5 (one FTCS step: T=dt)."""
    layer = FourierFTCSLayer(Nx=48, Ny=48, T=0.001, dt=0.001)
    params, state = layer.init(key)
    u = rng.random((2, 1, 48, 48)).astype(np.float32)
    out, _ = layer(params, state, jnp.asarray(u))
    golden = ref.fourier_ftcs_forward_np(u, _np_params(params), 48, 48, 1.0,
                                         1.0, 0.001, 0.001)
    np.testing.assert_allclose(np.asarray(out), golden, **TOL)


def test_fourier_ftcs_full_evolution_parity(rng, key):
    """The reference init is CFL-unstable (β·dt/dy² ≈ 1.6 > 0.25 at
    emotion_recognition.py:68-80 with dx=1/48), so 10 steps amplify values to
    ~1e6 and float32-vs-float64 drift amplifies with them; parity here is
    relative."""
    layer = FourierFTCSLayer(Nx=48, Ny=48)
    params, state = layer.init(key)
    u = rng.random((2, 1, 48, 48)).astype(np.float32)
    out, _ = layer(params, state, jnp.asarray(u))
    golden = ref.fourier_ftcs_forward_np(u, _np_params(params), 48, 48, 1.0,
                                         1.0, 0.01, 0.001)
    np.testing.assert_allclose(np.asarray(out), golden, rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("use_implicit", [False, True])
def test_residual_diffusion(rng, key, use_implicit):
    layer = ResidualDiffusion(size=16, channels=3, num_steps=2,
                              use_implicit=use_implicit)
    params, state = layer.init(key)
    u = rng.random((2, 3, 16, 16)).astype(np.float32)
    out, _ = layer(params, state, jnp.asarray(u))
    if not use_implicit:
        golden = ref.residual_forward_np(u, _np_params(params), 0.01, 2)
        np.testing.assert_allclose(np.asarray(out), golden, **TOL)
    else:
        # implicit path: behaves like diffusion (smooths), stays finite
        assert np.isfinite(np.asarray(out)).all()
        assert float(jnp.abs(out - jnp.asarray(u)).max()) > 0


def test_symmetric_layer_structure(rng, key):
    """F_sym output = −σ(BN(Y@w))@wᵀ; check against direct computation.

    The default layer is exact f32; the bf16-operand variant (what the
    hybrid model opts into — the reference trains it under AMP autocast,
    cifar_2version.py:503) must agree to half-precision tolerance."""
    layer = SymmetricLayer(channels=2, spatial_size=4)
    params, state = layer.init(key)
    Y = jnp.asarray(rng.standard_normal((8, 2, 4, 4)).astype(np.float32))
    out, _ = layer(params, state, Y, train=True)

    w = params["K"]["w"]
    y = Y.reshape(8, -1)
    ky = y @ w
    mean = ky.mean(0)
    var = ((ky - mean) ** 2).mean(0)
    norm = (ky - mean) / jnp.sqrt(var + 1e-5)
    expected = -(jax.nn.relu(norm) @ w.T)
    np.testing.assert_allclose(np.asarray(out).reshape(8, -1),
                               np.asarray(expected), rtol=1e-4, atol=1e-5)

    out_bf16, _ = SymmetricLayer(channels=2, spatial_size=4,
                                 compute_dtype=jnp.bfloat16)(
        params, state, Y, train=True)
    assert out_bf16.dtype == jnp.float32  # f32 accumulation/output
    np.testing.assert_allclose(np.asarray(out_bf16).reshape(8, -1),
                               np.asarray(expected), rtol=0.05, atol=0.05)


def test_parabolic_and_hamiltonian_blocks(rng, key):
    Y = jnp.asarray(rng.standard_normal((8, 2, 4, 4)).astype(np.float32))
    pb = ParabolicBlock(2, 4, num_steps=3, dt=0.5)
    p, s = pb.init(key)
    out, s2 = pb(p, s, Y, train=True)
    assert out.shape == Y.shape and np.isfinite(np.asarray(out)).all()
    # BN state in the symmetric layer must update across the 3 euler steps
    assert not np.allclose(np.asarray(s2["sym"]["norm"]["mean"]), 0.0)

    hb = HamiltonianBlock(2, 4, num_steps=3, dt=0.8)
    p, s = hb.init(key)
    out, _ = hb(p, s, Y, train=True)
    assert out.shape == Y.shape and np.isfinite(np.asarray(out)).all()


def test_stability_info(key):
    layer = GrayscaleDiffusion(size=28, dt=0.001, num_steps=10)
    params, _ = layer.init(key)
    info = layer.stability_info(params)
    # α=2.0, dt=1e-3, dx=1 → CFL = 0.002 < 0.5 stable
    assert info["stable_x"] and info["stable_y"]
    assert abs(info["cfl_x"] - 0.002) < 1e-6


def test_grads_flow_through_all_layers(rng, key):
    """Every learnable parameter of every PDE layer gets a finite gradient
    (beta_base in ResidualDiffusion is expected-zero: unused in forward)."""
    u1 = jnp.asarray(rng.random((2, 1, 28, 28)).astype(np.float32))
    u3 = jnp.asarray(rng.random((2, 3, 16, 16)).astype(np.float32))
    u48 = jnp.asarray(rng.random((2, 1, 48, 48)).astype(np.float32))
    cases = [
        (GrayscaleDiffusion(28, num_steps=2), u1, []),
        (ChannelCoupledDiffusion(16, num_steps=2), u3, []),
        (MixedChannelDiffusion(16, num_steps=2), u3, []),
        (FourierFTCSLayer(48, 48), u48, []),
        (ResidualDiffusion(16, num_steps=1), u3, ["beta_base"]),
    ]
    for layer, u, expect_zero in cases:
        params, state = layer.init(key)

        def loss(p):
            out, _ = layer(p, state, u)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params)
        for name, leaf in nn.param_path_items(g):
            arr = np.asarray(leaf)
            assert np.isfinite(arr).all(), f"{type(layer).__name__}.{name}"
            if any(name.startswith(z) for z in expect_zero):
                assert np.all(arr == 0), f"{name} should be unused"
            else:
                assert np.abs(arr).max() > 0, \
                    f"{type(layer).__name__}.{name} got zero grad"


def test_hoisted_evolution_matches_default(key):
    """hoisted=True (precomputed sweep operators + MXU matmul applies) must
    match the default per-sweep solve path on every ADI variant — forward
    and parameter gradients."""
    import numpy as np
    from cnn_pde_tpu.nn import Ctx
    from cnn_pde_tpu.pde import (ChannelCoupledDiffusion, GrayscaleDiffusion,
                                 MixedChannelDiffusion)

    rng = np.random.default_rng(0)
    cases = [
        (GrayscaleDiffusion, dict(size=12, num_steps=4), (3, 1, 12, 12)),
        # the older two-matmul implicit-function apply stays covered too
        (GrayscaleDiffusion,
         dict(size=12, num_steps=4, hoisted_refine=True), (3, 1, 12, 12)),
        (ChannelCoupledDiffusion, dict(size=10, num_steps=3), (3, 3, 10, 10)),
        (MixedChannelDiffusion,
         dict(size=10, num_steps=3, splitting="strang"), (3, 3, 10, 10)),
        (MixedChannelDiffusion,
         dict(size=10, num_steps=3, splitting="lie"), (3, 3, 10, 10)),
    ]
    for cls, kw, shape in cases:
        u = jnp.asarray(rng.random(shape).astype(np.float32))
        lay_h, lay_d = cls(hoisted=True, **kw), cls(hoisted=False, **kw)
        params, state = lay_h.init(key)
        params = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jax.random.normal(
                jax.random.fold_in(key, x.size), x.shape), params)

        def loss(lay, p):
            return jnp.sum(lay.apply(p, state, u, Ctx(train=True))[0] ** 2)

        y_h, _ = lay_h.apply(params, state, u, Ctx(train=True))
        y_d, _ = lay_d.apply(params, state, u, Ctx(train=True))
        np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_d),
                                   rtol=0, atol=1e-5)
        g_h = jax.grad(lambda p: loss(lay_h, p))(params)
        g_d = jax.grad(lambda p: loss(lay_d, p))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_h),
                        jax.tree_util.tree_leaves(g_d)):
            scale = max(1.0, float(jnp.max(jnp.abs(b))))
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale,
                                       rtol=0, atol=2e-5)


def test_enable_amp_wiring():
    """pde.enable_amp must find every ADI diffusion layer in a model tree,
    flip it to the hoisted-bf16 path, and set the global solver default to
    matinv_bf16 (restored afterwards)."""
    from cnn_pde_tpu.nn.layers import Conv2d, Linear
    from cnn_pde_tpu.ops import tridiag
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.pde import enable_amp, iter_adi_layers
    from cnn_pde_tpu.pde.amp import iter_modules
    from cnn_pde_tpu.pde.ruthotto import SymmetricLayer

    prev = tridiag.set_default_impl("auto")
    try:
        flagship = MODEL_REGISTRY["cifar10_noconv"]()
        n = enable_amp(flagship)
        assert n == len(list(iter_adi_layers(flagship))) and n >= 3
        for lay in iter_adi_layers(flagship):
            assert lay.hoisted and lay.operator_dtype == jnp.bfloat16
            assert not lay.hoisted_refine
        assert tridiag._DEFAULT_IMPL == "matinv_bf16"
        # plain Linears are NOT cast (measured loss — XLA DEFAULT matmuls
        # already run as MXU passes; pde/amp.py docstring)
        linears = list(iter_modules(flagship, Linear))
        assert linears and all(l.compute_dtype is None for l in linears)

        # a model with no ADI layers: impl still switches, zero ADI layers
        # found, but the conv backbone gets bf16 operands (+7% measured)
        tiny = MODEL_REGISTRY["tiny_imagenet"]()
        assert enable_amp(tiny) == 0
        convs = list(iter_modules(tiny, Conv2d))
        assert convs and all(c.compute_dtype == jnp.bfloat16 for c in convs)

        # dense=False leaves the conv backbone exact
        tiny2 = MODEL_REGISTRY["tiny_imagenet"]()
        enable_amp(tiny2, dense=False)
        assert all(c.compute_dtype is None
                   for c in iter_modules(tiny2, Conv2d))

        # the hybrid's Ruthotto blocks stay/become bf16 too
        hybrid = MODEL_REGISTRY["cifar10_hybrid"]()
        enable_amp(hybrid)
        syms = list(iter_modules(hybrid, SymmetricLayer))
        assert len(syms) == 3
        assert all(s.compute_dtype == jnp.bfloat16 for s in syms)
    finally:
        tridiag.set_default_impl(prev)
