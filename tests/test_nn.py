"""NN layer parity tests against torch CPU as an independent oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu import nn

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def test_linear_forward_matches_torch(rng, key):
    lin = nn.Linear(32, 16)
    params, state = lin.init(key)
    x = rng.standard_normal((4, 32)).astype(np.float32)

    tl = tnn.Linear(32, 16)
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(params["w"]).T))
        tl.bias.copy_(torch.from_numpy(np.asarray(params["b"])))
    ref = tl(torch.from_numpy(x)).detach().numpy()
    out, _ = lin(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_linear_default_init_distribution(key):
    lin = nn.Linear(784, 256)
    params, _ = lin.init(key)
    bound = 1.0 / np.sqrt(784)
    w = np.asarray(params["w"])
    assert w.min() >= -bound and w.max() <= bound
    # roughly uniform: std ≈ bound/sqrt(3)
    assert abs(w.std() - bound / np.sqrt(3)) < 0.1 * bound


@pytest.mark.parametrize("shape", [(8, 5), (8, 5, 6, 7)])
def test_batchnorm_matches_torch_train_and_eval(rng, key, shape):
    C = shape[1]
    bn = nn.BatchNorm(C)
    params, state = bn.init(key)
    tb = tnn.BatchNorm1d(C) if len(shape) == 2 else tnn.BatchNorm2d(C)

    x1 = rng.standard_normal(shape).astype(np.float32)
    x2 = rng.standard_normal(shape).astype(np.float32)

    # two train steps (running stats accumulate), then one eval step
    tb.train()
    ref1 = tb(torch.from_numpy(x1)).detach().numpy()
    ref2 = tb(torch.from_numpy(x2)).detach().numpy()
    tb.eval()
    ref3 = tb(torch.from_numpy(x1)).detach().numpy()

    out1, state = bn(params, state, jnp.asarray(x1), train=True)
    out2, state = bn(params, state, jnp.asarray(x2), train=True)
    out3, _ = bn(params, state, jnp.asarray(x1), train=False)

    np.testing.assert_allclose(np.asarray(out1), ref1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), ref2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out3), ref3, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state["mean"]), tb.running_mean.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state["var"]), tb.running_var.numpy(), rtol=1e-4, atol=1e-5
    )


def test_dropout_scaling_and_determinism(key):
    do = nn.Dropout(0.5)
    params, state = do.init(key)
    x = jnp.ones((1000, 100))
    y, _ = do(params, state, x, train=True, rng=key)
    kept = np.asarray(y) != 0
    assert abs(kept.mean() - 0.5) < 0.02
    assert np.allclose(np.asarray(y)[kept], 2.0)
    y2, _ = do(params, state, x, train=True, rng=key)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    y3, _ = do(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(x))


def test_conv2d_matches_torch(rng, key):
    conv = nn.Conv2d(3, 8, 3, stride=2, padding=1)
    params, state = conv.init(key)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)

    tc = tnn.Conv2d(3, 8, 3, stride=2, padding=1)
    with torch.no_grad():
        tc.weight.copy_(torch.from_numpy(np.asarray(params["w"])))
        tc.bias.copy_(torch.from_numpy(np.asarray(params["b"])))
    ref = tc(torch.from_numpy(x)).detach().numpy()
    out, _ = conv(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_maxpool_matches_torch(rng, key):
    mp = nn.MaxPool2d(3, stride=2, padding=1)
    params, state = mp.init(key)
    x = rng.standard_normal((2, 4, 17, 17)).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), 3, 2, 1).numpy()
    out, _ = mp(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref)


@pytest.mark.parametrize("hw,out", [((32, 32), 4), ((32, 32), 8), ((7, 9), 4), ((2, 2), 1)])
def test_adaptive_pools_match_torch(rng, key, hw, out):
    x = rng.standard_normal((2, 3) + hw).astype(np.float32)
    ap = nn.AdaptiveAvgPool2d(out)
    mpool = nn.AdaptiveMaxPool2d(out)
    pa, sa = ap.init(key)
    pm, sm = mpool.init(key)
    ref_a = F.adaptive_avg_pool2d(torch.from_numpy(x), out).numpy()
    ref_m = F.adaptive_max_pool2d(torch.from_numpy(x), out).numpy()
    out_a, _ = ap(pa, sa, jnp.asarray(x))
    out_m, _ = mpool(pm, sm, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_a), ref_a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_m), ref_m, rtol=1e-5, atol=1e-6)


def test_sequential_and_param_paths(key):
    model = nn.Sequential([
        nn.Linear(10, 20), nn.BatchNorm(20), nn.ReLU(), nn.Dropout(0.1),
        nn.Linear(20, 5),
    ])
    params, state = model.init(key)
    names = [n for n, _ in nn.param_path_items(params)]
    assert "0.w" in names and "4.w" in names and "1.scale" in names
    x = jnp.ones((3, 10))
    y, new_state = model(params, state, x, train=True, rng=key)
    assert y.shape == (3, 5)
    # BN state updated in train mode
    assert not np.allclose(np.asarray(new_state["1"]["mean"]), 0.0)


def test_compute_dtype_bf16_linear_conv(rng, key):
    """Dense AMP surface (pde.enable_amp dense=True): Linear/Conv2d with
    compute_dtype=bf16 cast OPERANDS only and accumulate f32 — outputs are
    f32 and within bf16-rounding tolerance of the exact path.  Emulated
    rounding bounds it on backends without native bf16 dots."""
    x = rng.standard_normal((4, 64)).astype(np.float32)
    lin = nn.Linear(64, 32)
    params, state = lin.init(key)
    y32, _ = lin(params, state, jnp.asarray(x))
    lin.compute_dtype = jnp.bfloat16
    try:
        y16, _ = lin(params, state, jnp.asarray(x))
        y16.block_until_ready()
    except Exception as e:  # CPU thunk runtime: some bf16 dots unsupported
        if "BF16" not in str(e):
            raise
    else:
        assert y16.dtype == jnp.float32
        scale = float(jnp.max(jnp.abs(y32)))
        assert float(jnp.max(jnp.abs(y16 - y32))) / scale < 0.03

    xc = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    conv = nn.Conv2d(3, 8, 3, padding=1)
    pc, sc = conv.init(key)
    c32, _ = conv(pc, sc, jnp.asarray(xc))
    conv.compute_dtype = jnp.bfloat16
    try:
        c16, _ = conv(pc, sc, jnp.asarray(xc))
        c16.block_until_ready()
    except Exception as e:
        if "BF16" not in str(e):
            raise
    else:
        assert c16.dtype == jnp.float32
        scale = float(jnp.max(jnp.abs(c32)))
        assert float(jnp.max(jnp.abs(c16 - c32))) / scale < 0.03
