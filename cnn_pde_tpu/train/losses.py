"""Losses and regularizers (L4).

Cross-entropy matches torch.nn.CrossEntropyLoss semantics including label
smoothing (used with 0.1 at mnist_test.py:284, cifar10.py:437,
tiny_imagenet.py:556; without smoothing at SVHN.py:315).

``hybrid_pde_regularization`` re-implements cifar_2version.py:415-436: L2 on
α/β bases, Frobenius-to-identity on channel mixing, L2 on symmetric-layer K,
L1 on combination weights — selected by parameter path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.core import param_path_items

__all__ = ["cross_entropy", "hybrid_pde_regularization"]


def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    """Mean CE over the batch; torch-style label smoothing distributes ε/K
    over every class (including the target)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    n, k = logits.shape
    nll = -logp[jnp.arange(n), labels]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.mean(nll)


def hybrid_pde_regularization(params, alpha1=2e-4, alpha2=1e-4, alpha3=1e-6):
    """Path-matched regularizer mirroring the reference's name-matched one.
    Called with (2e-4, 1e-4, 1e-6) in the hybrid train loop
    (cifar_2version.py:524)."""
    reg = 0.0
    for name, p in param_path_items(params):
        if "alpha_base" in name or "beta_base" in name:
            reg = reg + alpha3 * jnp.sum(p**2)
        elif "channel_mixing" in name:
            eye = jnp.eye(p.shape[0], dtype=p.dtype)
            reg = reg + alpha2 * jnp.sum((p - eye) ** 2)
        elif ".K." in name or name.endswith("K.w"):
            reg = reg + alpha2 * jnp.sum(p**2)
        elif "combination_weights" in name:
            reg = reg + alpha1 * jnp.sum(jnp.abs(p))
    return reg
