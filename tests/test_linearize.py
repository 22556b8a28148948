"""Linearized frozen-params serving (serve.linearize_pde_layers).

Every PDE front-end layer is linear in u (pde/linearize.py docstring), so
its whole evolution composes into one (D, D) matrix.  These tests pin the
linearity invariant itself per layer family, and the serving behaviors:
prediction agreement, train-mode refusal, max_dim gating, cache clearing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.nn.core import Ctx
from cnn_pde_tpu.pde import (
    ChannelCoupledDiffusion,
    FourierFTCSLayer,
    GrayscaleDiffusion,
    MixedChannelDiffusion,
    ResidualDiffusion,
)
from cnn_pde_tpu.serve import (
    clear_linear_cache,
    linearize_pde_layers,
    make_predict_fn,
)

LAYERS = [
    ("grayscale", lambda: GrayscaleDiffusion(size=8, num_steps=3), (1, 8, 8)),
    ("coupled", lambda: ChannelCoupledDiffusion(size=8, num_steps=3),
     (3, 8, 8)),
    ("mixed_strang", lambda: MixedChannelDiffusion(size=8, num_steps=3),
     (3, 8, 8)),
    ("mixed_lie",
     lambda: MixedChannelDiffusion(size=8, num_steps=3, splitting="lie"),
     (3, 8, 8)),
    ("ftcs", lambda: FourierFTCSLayer(Nx=8, Ny=8), (1, 8, 8)),
    ("residual", lambda: ResidualDiffusion(size=8), (3, 8, 8)),
    ("residual_implicit", lambda: ResidualDiffusion(size=8, use_implicit=True),
     (3, 8, 8)),
]


@pytest.mark.parametrize("name,make,shape",
                         [pytest.param(*t, id=t[0]) for t in LAYERS])
def test_pde_layers_are_linear_in_u(rng, key, name, make, shape):
    """The invariant linearized serving rests on: L(a·u1 + b·u2) ==
    a·L(u1) + b·L(u2) — clamps/sigmoids act on params, never activations."""
    layer = make()
    params, state = layer.init(key)
    u1 = jnp.asarray(rng.standard_normal((2,) + shape).astype(np.float32))
    u2 = jnp.asarray(rng.standard_normal((2,) + shape).astype(np.float32))
    a, b = 1.7, -0.6
    f = jax.jit(lambda u: layer.apply(params, state, u, Ctx(train=False))[0])
    lhs = f(a * u1 + b * u2)
    rhs = a * f(u1) + b * f(u2)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name,make,shape",
                         [pytest.param(*t, id=t[0]) for t in LAYERS])
def test_linearize_single_layer_matches_sequential(rng, key, name, make,
                                                   shape):
    layer = make()
    params, state = layer.init(key)
    x = jnp.asarray(rng.standard_normal((3,) + shape).astype(np.float32))
    ref, _ = jax.jit(lambda u: layer.apply(params, state, u,
                                           Ctx(train=False)))(x)

    assert linearize_pde_layers(layer, params, state, x) == 1
    assert layer.linear_cache.shape == (int(np.prod(shape)),) * 2
    out, _ = jax.jit(lambda u: layer.apply(params, state, u,
                                           Ctx(train=False)))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    assert clear_linear_cache(layer) == 1


def test_linearize_flagship_model(rng, key):
    """All three MultiScaleExtractor branches linearize; predictions agree
    with the sequential path; training with a pinned cache refuses."""
    from cnn_pde_tpu.models import CIFAR10PDENoConv

    model = CIFAR10PDENoConv()
    params, state = model.init(key)
    x = jnp.asarray(rng.random((3, 3, 32, 32)).astype(np.float32))
    ref = make_predict_fn(model, params, state, output="probs")(x)

    n = linearize_pde_layers(model, params, state, x)
    assert n == 3
    out = make_predict_fn(model, params, state, output="probs")(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="linear_cache"):
        model.apply(params, state, x, Ctx(train=True, rng=key))

    assert clear_linear_cache(model) == 3
    out2 = make_predict_fn(model, params, state, output="probs")(x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=0, atol=0)


def test_linearize_composes_with_hoisted_operator_cache(rng, key):
    """linearize after cache_hoisted_operators: the composed matrix bakes in
    the (f32) cached operators — same predictions, and the linear_cache
    takes precedence so serving still works."""
    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.serve import cache_hoisted_operators, clear_operator_cache

    model = CIFAR10PDENoConv()
    for pde in model.extractor.pdes:
        pde.hoisted = True
    params, state = model.init(key)
    x = jnp.asarray(rng.random((2, 3, 32, 32)).astype(np.float32))
    ref = make_predict_fn(model, params, state)(x)

    assert cache_hoisted_operators(model, params, state, x) == 3
    assert linearize_pde_layers(model, params, state, x) == 3
    out = make_predict_fn(model, params, state)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    clear_linear_cache(model)
    clear_operator_cache(model)


def test_linearize_max_dim_gate(rng, key):
    """Layers with D > max_dim stay sequential (tiny_imagenet's 12288 would
    be a 604 MB matrix for a ~0.3 ms front-end)."""
    layer = MixedChannelDiffusion(size=8, num_steps=2)
    params, state = layer.init(key)
    x = jnp.asarray(rng.random((2, 3, 8, 8)).astype(np.float32))
    ref, _ = layer.apply(params, state, x, Ctx(train=False))
    assert linearize_pde_layers(layer, params, state, x, max_dim=100) == 0
    assert getattr(layer, "linear_cache", None) is None
    out, _ = layer.apply(params, state, x, Ctx(train=False))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=0)


def test_linearize_composes_with_export_and_dp(rng, key):
    """The linearized model must export to StableHLO (matrices embedded as
    constants) and serve data-parallel over a mesh, agreeing with the
    in-process predictions."""
    import jax

    from cnn_pde_tpu.models import EmotionClassifier
    from cnn_pde_tpu.parallel.mesh import make_mesh
    from cnn_pde_tpu.serve import export_model, load_exported

    model = EmotionClassifier()
    params, state = model.init(key)
    x = jnp.asarray(rng.random((8, 1, 48, 48)).astype(np.float32))
    assert linearize_pde_layers(model, params, state, x) == 1
    ref = np.asarray(make_predict_fn(model, params, state)(x))

    # random-init emotion logits are ~1e4 (the reference's CFL-unstable
    # layer amplifies), so reload-compile reassociation needs a
    # scale-relative tolerance; label agreement must be exact
    blob = export_model(model, params, state, x)
    out = np.asarray(load_exported(blob)(x))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, rtol=0, atol=1e-4)
    np.testing.assert_array_equal(out.argmax(-1), ref.argmax(-1))

    if len(jax.devices()) >= 8:
        mesh = make_mesh(spatial=1)
        dp = np.asarray(make_predict_fn(model, params, state, mesh=mesh)(x))
        np.testing.assert_allclose(dp / scale, ref / scale, rtol=0, atol=1e-4)
    clear_linear_cache(model)


def test_linearize_bf16_storage(rng, key):
    """dtype=bf16 halves the pinned-matrix HBM traffic; outputs agree with
    the sequential path at half-precision scale (f32 accumulation)."""
    layer = MixedChannelDiffusion(size=8, num_steps=3)
    params, state = layer.init(key)
    x = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32))
    ref, _ = layer.apply(params, state, x, Ctx(train=False))
    assert linearize_pde_layers(layer, params, state, x,
                                dtype=jnp.bfloat16) == 1
    assert layer.linear_cache.dtype == jnp.bfloat16
    out, _ = layer.apply(params, state, x, Ctx(train=False))
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    clear_linear_cache(layer)


def test_linearize_int8_quantization(rng, key):
    """dtype=int8 → W8A8 QuantizedMatrix: dequantized weights within half a
    quantization step of the f32 matrix per entry; layer outputs within the
    combined weight+activation rounding budget."""
    from cnn_pde_tpu.pde.linearize import QuantizedMatrix

    layer = MixedChannelDiffusion(size=8, num_steps=3)
    params, state = layer.init(key)
    x = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32))
    ref, _ = layer.apply(params, state, x, Ctx(train=False))

    assert linearize_pde_layers(layer, params, state, x) == 1
    m_f32 = np.asarray(layer.linear_cache)
    clear_linear_cache(layer)

    assert linearize_pde_layers(layer, params, state, x,
                                dtype=jnp.int8) == 1
    cache = layer.linear_cache
    assert isinstance(cache, QuantizedMatrix)
    assert cache.q.dtype == jnp.int8 and cache.q.shape == m_f32.shape
    assert cache.scale.shape == (m_f32.shape[1],)
    deq = np.asarray(cache.q, np.float32) * np.asarray(cache.scale)[None, :]
    # round() puts every dequantized entry within scale/2 of the original
    assert (np.abs(deq - m_f32) <= 0.5 * np.asarray(cache.scale)[None, :]
            + 1e-12).all()

    out, _ = jax.jit(lambda u: layer.apply(params, state, u,
                                           Ctx(train=False)))(x)
    assert out.dtype == jnp.float32
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() <= 2e-2 * np.abs(np.asarray(ref)).max()
    clear_linear_cache(layer)


def test_linearize_int8_flagship_predictions(rng, key):
    """W8A8 serving on the flagship: all 3 branches quantize, predicted
    labels agree with the sequential path on a random batch, and the
    train-mode refusal still fires with a QuantizedMatrix pinned."""
    from cnn_pde_tpu.models import CIFAR10PDENoConv

    model = CIFAR10PDENoConv()
    params, state = model.init(key)
    x = jnp.asarray(rng.random((16, 3, 32, 32)).astype(np.float32))
    ref = make_predict_fn(model, params, state, output="labels")(x)

    assert linearize_pde_layers(model, params, state, x,
                                dtype=jnp.int8) == 3
    out = make_predict_fn(model, params, state, output="labels")(x)
    assert (np.asarray(out) == np.asarray(ref)).all()

    with pytest.raises(ValueError, match="linear_cache"):
        model.apply(params, state, x, Ctx(train=True, rng=key))
    assert clear_linear_cache(model) == 3


def test_linearize_int8_exports(rng, key):
    """An int8-linearized model exports to StableHLO (the QuantizedMatrix
    q/scale embedded as constants) and the reload reproduces the in-process
    quantized predictions."""
    from cnn_pde_tpu.serve import export_model, load_exported

    layer = MixedChannelDiffusion(size=8, num_steps=3)
    params, state = layer.init(key)
    x = jnp.asarray(rng.standard_normal((4, 3, 8, 8)).astype(np.float32))
    assert linearize_pde_layers(layer, params, state, x,
                                dtype=jnp.int8) == 1
    ref = np.asarray(make_predict_fn(layer, params, state)(x))
    blob = export_model(layer, params, state, x)
    out = np.asarray(load_exported(blob)(x))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)
    clear_linear_cache(layer)


def test_evolution_spectrum(key):
    """Exact stability analysis from the composed operator: implicit
    Neumann diffusion is non-amplifying with the constant mode conserved
    (spectral radius == 1); beyond the reference's CFL heuristic."""
    from cnn_pde_tpu.utils.analysis import evolution_spectrum

    layer = GrayscaleDiffusion(size=12, num_steps=4, dt=0.01)
    params, _ = layer.init(key)
    spec = evolution_spectrum(layer, params, (1, 12, 12))
    assert spec["dim"] == 144
    assert spec["stable"]
    assert abs(spec["spectral_radius"] - 1.0) < 1e-4
    assert spec["sigma_min"] > 0.0  # the implicit solve is invertible
    # the linearize hook must be cleanly unwound: a normal apply still works
    u = jnp.ones((2, 1, 12, 12), jnp.float32)
    out, _ = layer.apply(params, {}, u, Ctx(train=False))
    # diffusion of a constant field is the constant field (Neumann; the
    # reference's eps-in-denominator quirk decays it by ~1e-6/substep)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=0, atol=5e-5)

    with pytest.raises(ValueError, match="max_dim"):
        evolution_spectrum(layer, params, (1, 12, 12), max_dim=10)


def test_linearize_emotion_classifier(rng, key):
    """The FTCS spectral layer inside the emotion model linearizes (the
    frozen reflect-ring boundary is linear in the initial u)."""
    from cnn_pde_tpu.models import EmotionClassifier

    model = EmotionClassifier()
    params, state = model.init(key)
    x = jnp.asarray(rng.random((2, 1, 48, 48)).astype(np.float32))
    ref = make_predict_fn(model, params, state)(x)
    assert linearize_pde_layers(model, params, state, x) == 1
    out = make_predict_fn(model, params, state)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    clear_linear_cache(model)


def test_select_linearize_grade_table():
    """The --linearize auto decision table pins the measured serving
    frontier (PERF.md §linearized-int8, §serving-batch-frontier): int8 from
    batch 256 up on large-D models, bf16 below and for small-D presets."""
    from cnn_pde_tpu.serve import select_linearize_grade as grade

    assert grade(1024, feature_dim=3072) == jnp.int8
    assert grade(256, feature_dim=3072) == jnp.int8
    assert grade(255, feature_dim=3072) == jnp.bfloat16
    assert grade(64, feature_dim=3072) == jnp.bfloat16
    assert grade(1, feature_dim=3072) == jnp.bfloat16
    # small-D presets (mnist/fashion D=784): bf16 at every batch size
    assert grade(1024, feature_dim=784) == jnp.bfloat16
    assert grade(1, feature_dim=784) == jnp.bfloat16
    # no feature_dim: pure batch-size frontier
    assert grade(512) == jnp.int8
    assert grade(8) == jnp.bfloat16


def test_linearize_auto_grade(rng, key):
    """dtype='auto' resolves through select_linearize_grade from the
    serving batch size + the sample's D and pins the same cache the
    explicit grade would (small-D layer: bf16 even at champion batch;
    large-D layer at batch >= 256: int8 QuantizedMatrix)."""
    from cnn_pde_tpu.pde.linearize import QuantizedMatrix

    layer = MixedChannelDiffusion(size=8, num_steps=2)  # D = 192: small-D
    params, state = layer.init(key)
    x = jnp.asarray(rng.standard_normal((2, 3, 8, 8)).astype(np.float32))
    assert linearize_pde_layers(layer, params, state, x, dtype="auto",
                                serve_batch_size=1024) == 1
    assert layer.linear_cache.dtype == jnp.bfloat16
    clear_linear_cache(layer)

    big = MixedChannelDiffusion(size=32, num_steps=1)   # D = 3072
    bparams, bstate = big.init(key)
    bx = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    ref, _ = big.apply(bparams, bstate, bx, Ctx(train=False))
    assert linearize_pde_layers(big, bparams, bstate, bx, dtype="auto",
                                serve_batch_size=512) == 1
    assert isinstance(big.linear_cache, QuantizedMatrix)
    out, _ = big.apply(bparams, bstate, bx, Ctx(train=False))
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.max() <= 2e-2 * np.abs(np.asarray(ref)).max()
    clear_linear_cache(big)

    # serve_batch_size omitted: falls back to the sample batch (2 -> bf16)
    assert linearize_pde_layers(big, bparams, bstate, bx,
                                dtype="auto") == 1
    assert big.linear_cache.dtype == jnp.bfloat16
    clear_linear_cache(big)
