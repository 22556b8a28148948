"""Data-parallel training over a device mesh.

Idiomatic pjit DP: params/state/opt-state replicated, batch sharded over the
'data' axis; the gradient all-reduce is inserted by XLA (psum over ICI) when
the jitted step consumes the sharded batch and produces replicated params.
Replaces the reference's single-device loop (SURVEY.md §2.6 item 1).
"""

from __future__ import annotations

import jax
import optax

from ..nn.core import Ctx
from ..train.losses import cross_entropy
from .mesh import dp_shardings

__all__ = ["make_dp_train_step", "make_train_step_body", "shard_batch",
           "replicate"]


def shard_batch(mesh, batch):
    """Place a batch pytree sharded over the mesh's 'data' axis.

    Single-process: a plain device_put.  Multi-process (the mesh spans
    hosts): each process feeds only its ``local_batch_slice`` rows — the
    leaves here are expected to be the FULL global batch on every host
    (each host loads the whole small dataset); the global jax.Array is
    assembled from the local rows (multihost.global_batch_from_local)."""
    bs, _ = dp_shardings(mesh)
    if jax.process_count() > 1:
        import numpy as np

        from .multihost import local_batch_slice

        def make(x):
            x = np.asarray(x)
            start, size = local_batch_slice(x.shape[0])
            return jax.make_array_from_process_local_data(
                bs, x[start:start + size])

        return jax.tree_util.tree_map(make, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, bs), batch)


def replicate(mesh, tree):
    """Replicate a pytree over every device of ``mesh`` — multi-process
    safe (every host passes the same full value)."""
    _, rep = dp_shardings(mesh)
    if jax.process_count() > 1:
        import numpy as np

        def make(x):
            return jax.make_array_from_process_local_data(rep, np.asarray(x))

        return jax.tree_util.tree_map(make, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def make_train_step_body(model, optimizer, *, label_smoothing=0.1,
                         regularizer=None, augment_fn=None):
    """Unjitted step(params, model_state, opt_state, images, labels, rng) —
    the ONE train-step body shared by the DP and TP step builders (which
    differ only in how shardings are attached: explicit in/out_shardings
    here vs committed-input GSPMD propagation in tensor_parallel.py)."""

    def step(params, model_state, opt_state, images, labels, rng):
        if augment_fn is not None:
            rng, arng = jax.random.split(rng)
            images = augment_fn(arng, images)

        def loss_fn(p):
            logits, new_state = model.apply(p, model_state, images,
                                            Ctx(train=True, rng=rng))
            loss = cross_entropy(logits, labels, label_smoothing)
            if regularizer is not None:
                loss = loss + regularizer(p)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, loss

    return step


def make_dp_train_step(model, optimizer, mesh, *, label_smoothing=0.1,
                       regularizer=None, augment_fn=None):
    """Returns jit'd step(params, model_state, opt_state, images, labels, rng)
    with explicit in/out shardings over ``mesh``."""
    batch_s, rep_s = dp_shardings(mesh)
    step = make_train_step_body(model, optimizer,
                                label_smoothing=label_smoothing,
                                regularizer=regularizer,
                                augment_fn=augment_fn)
    return jax.jit(
        step,
        in_shardings=(rep_s, rep_s, rep_s, batch_s, batch_s, rep_s),
        out_shardings=(rep_s, rep_s, rep_s, rep_s),
    )
