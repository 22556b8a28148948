"""Model assembly tests: shapes, parameter counts vs reference architectures,
train/eval modes, gradient flow through every flagship model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu import nn
from cnn_pde_tpu.models import (
    MODEL_REGISTRY,
    CIFAR10HybridPDEModel,
    CIFAR10PDENoConv,
    EmotionClassifier,
    FashionClassifier,
    MNISTClassifier,
    SVHNClassifier,
    TinyImageNetClassifier,
)

CASES = [
    # (name, ctor kwargs, input shape, num classes)
    ("mnist", {}, (2, 1, 28, 28), 10),
    ("fashion_mnist", {}, (2, 1, 28, 28), 10),
    ("svhn", {}, (2, 3, 32, 32), 10),
    ("cifar10_noconv", {}, (2, 3, 32, 32), 10),
    ("cifar10_hybrid", {}, (2, 3, 32, 32), 10),
    ("emotion", {}, (2, 1, 48, 48), 7),
    ("tiny_imagenet", {"num_classes": 200}, (2, 3, 64, 64), 200),
]


@pytest.mark.parametrize("name,kwargs,shape,classes", CASES)
def test_forward_shapes_train_and_eval(rng, key, name, kwargs, shape, classes):
    model = MODEL_REGISTRY[name](**kwargs)
    params, state = model.init(key)
    x = jnp.asarray(rng.random(shape).astype(np.float32))
    y_train, new_state = model(params, state, x, train=True,
                               rng=jax.random.PRNGKey(7))
    assert y_train.shape == (shape[0], classes)
    assert np.isfinite(np.asarray(y_train)).all()
    y_eval, _ = model(params, new_state, x, train=False)
    assert y_eval.shape == (shape[0], classes)
    assert np.isfinite(np.asarray(y_eval)).all()


def _count(params):
    return sum(int(np.prod(p.shape)) for _, p in nn.param_path_items(params))


def test_mnist_param_count(key):
    """Reference: 4×28² PDE params + fc1(784·256+256) + fc2(256·10+10)."""
    model = MNISTClassifier()
    params, _ = model.init(key)
    expected = 4 * 28 * 28 + (784 * 256 + 256) + (256 * 10 + 10)
    assert _count(params) == expected


def test_svhn_param_count(key):
    model = SVHNClassifier()
    params, _ = model.init(key)
    pde = 4 * 3 * 32 * 32 + 9 + 1  # fields + coupling + skip
    head = ((3072 * 2048 + 2048) + (2048 * 1024 + 1024)
            + (1024 * 512 + 512) + (512 * 256 + 256) + (256 * 10 + 10))
    bn = 2 * (2048 + 1024 + 512 + 256)
    assert _count(params) == pde + head + bn


def test_cifar10_noconv_param_groups(key):
    """The α/β param-group split (cifar10.py:425-429) must be expressible via
    param paths."""
    model = CIFAR10PDENoConv()
    params, _ = model.init(key)
    names = [n for n, _ in nn.param_path_items(params)]
    alpha_beta = [n for n in names if "alpha" in n or "beta" in n]
    # 3 PDE layers × 4 fields
    assert len(alpha_beta) == 12
    assert any("combine_weights" in n for n in names)


def test_hybrid_model_has_all_pde_families(key):
    model = CIFAR10HybridPDEModel()
    params, _ = model.init(key)
    names = [n for n, _ in nn.param_path_items(params)]
    for frag in ["diffusion1", "diffusion2", "parabolic", "hamiltonian",
                 "combination_weights", "channel_mixing"]:
        assert any(frag in n for n in names), frag


def test_gradients_flow_end_to_end(rng, key):
    """Loss gradient reaches the PDE coefficients through the full model."""
    model = MNISTClassifier()
    params, state = model.init(key)
    x = jnp.asarray(rng.random((4, 1, 28, 28)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])

    def loss(p):
        logits, _ = model(p, state, x, train=True, rng=jax.random.PRNGKey(0))
        return -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(4), labels])

    g = jax.grad(loss)(params)
    ga = np.asarray(g["diff"]["alpha_base"])
    assert np.isfinite(ga).all() and np.abs(ga).max() > 0


def test_tiny_imagenet_without_pde(rng, key):
    model = TinyImageNetClassifier(num_classes=200, use_pde=False)
    params, state = model.init(key)
    assert "diff" not in params
    x = jnp.asarray(rng.random((2, 3, 64, 64)).astype(np.float32))
    y, _ = model(params, state, x, train=False)
    assert y.shape == (2, 200)
