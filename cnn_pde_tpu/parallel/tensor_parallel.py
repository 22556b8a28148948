"""Tensor parallelism for the FC head stacks: Megatron-style column/row
sharding over the mesh's 'model' axis, expressed as GSPMD sharding
annotations (NOT hand-written collectives).

The reference is single-device (SURVEY.md §2.6) and its largest dense
layers are the classifier heads (cifar10.py:286-314 — 96→512→256→128→64→10;
cifar_2version.py's 1024-wide hybrid head).  TPU-native scaling of those
matmuls is the canonical recipe: pick a mesh, annotate the *parameters*
(first Linear column-parallel → activation feature-sharded; next Linear
row-parallel → one psum over ICI restores replication), and let XLA insert
the collectives.  Composes freely with data parallelism: batch over 'data',
FC weights over 'model', on one 3-axis mesh (mesh.make_mesh).

The chain walker is structural: any params subtree whose children are all
numeric string keys (the Sequential convention, nn/core.py:67-87) is
treated as a layer chain; 2-D 'w' leaves are Linears, {scale, bias} dicts
are BatchNorms.  Linears too small to split (min_features) or not divisible
by the axis size stay replicated, and the carry resets — so tiny attention
MLPs and final class heads are untouched while the wide stacks shard.

Usage::

    mesh   = make_mesh(data=2, model=4)
    specs  = tp_param_specs(params, mesh)          # pytree of PartitionSpec
    params = shard_pytree(mesh, params, specs)
    opt_state = jax.jit(optimizer.init)(params)    # inherits param shardings
    step   = make_tp_train_step(model, optimizer, mesh)
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .data_parallel import make_train_step_body
from .data_parallel import replicate as replicated_like  # same operation

__all__ = ["tp_param_specs", "shard_pytree", "make_tp_train_step",
           "replicated_like"]

AXIS = "model"


def _is_sequential(d):
    return (isinstance(d, dict) and d
            and all(isinstance(k, str) and k.isdigit() for k in d))


def _is_linear(d):
    return isinstance(d, dict) and "w" in d and getattr(d["w"], "ndim", 0) == 2


def _is_batchnorm(d):
    return isinstance(d, dict) and set(d) == {"scale", "bias"}


def _is_symmetric(d):
    """The SymmetricLayer param pattern (pde/ruthotto.py): a bias-free
    SQUARE Linear ``K`` plus a BatchNorm over its output features.  The
    layer computes F_sym(Y) = −σ(BN(Y·w))·wᵀ — the same matrix applied
    twice (cifar_2version.py:199,210-211,220)."""
    return (isinstance(d, dict) and set(d) == {"K", "norm"}
            and _is_linear(d["K"]) and "b" not in d["K"]
            and d["K"]["w"].shape[0] == d["K"]["w"].shape[1]
            and _is_batchnorm(d["norm"]))


def _symmetric_specs(d, tp, axis, min_features):
    """Megatron col→row with ONE matrix: shard w (in,out layout) over its
    OUT dim, P(None, axis).  The first matmul Y·w is then column-parallel
    (activations feature-sharded; BN params/stats ride the shard, and its
    batch-statistics reduction is over the batch axis, so it needs no
    'model' collective); the second matmul σ(...)·wᵀ contracts over the
    SAME sharded feature axis — row-parallel — leaving per-device partial
    sums whose psum over 'model' is the single all-reduce XLA must insert
    to restore the replicated (B, D) output that feeds Y + dt·F.  One
    all-reduce per F_sym evaluation; asserted against compiled HLO in
    tests/test_tensor_parallel.py::test_symmetric_hlo_one_allreduce_per_step.

    The hybrid model's K is 3072² ≈ 9.4M params — the repo's largest single
    weight and SURVEY §2.6-4's named TP case; sharding it col-parallel
    splits both the weight and the (B, 3072) hidden activations 1/tp per
    device."""
    D = d["K"]["w"].shape[0]
    if D % tp != 0 or D < min_features:
        return jax.tree_util.tree_map(lambda _: P(), d)
    return {"K": {"w": P(None, axis)},
            "norm": {"scale": P(axis), "bias": P(axis)}}


def _chain_specs(seq, tp, axis, min_features):
    """Specs for one Sequential chain: alternate column/row parallel.

    carry=True means the activation flowing OUT of the previous layer is
    feature-sharded over ``axis``; BatchNorm params between a col-parallel
    and a row-parallel Linear shard with it."""
    out = {}
    carry = False
    for k in sorted(seq, key=int):
        d = seq[k]
        if _is_linear(d):
            fin, fout = d["w"].shape
            if not carry and fout % tp == 0 and fout >= min_features:
                spec = {"w": P(None, axis)}
                if "b" in d:
                    spec["b"] = P(axis)
                carry = True
            elif carry and fin % tp == 0:
                spec = {"w": P(axis, None)}
                if "b" in d:
                    spec["b"] = P()
                carry = False
            else:
                spec = {name: P() for name in d}
                carry = False
            out[k] = spec
        elif _is_batchnorm(d):
            out[k] = {name: (P(axis) if carry else P()) for name in d}
        else:
            out[k] = jax.tree_util.tree_map(lambda _: P(), d)
    return out


def tp_param_specs(params, mesh, *, axis=AXIS, min_features=128):
    """PartitionSpec pytree for ``params``: Megatron col/row alternation in
    every Sequential FC chain, P() (replicated) everywhere else.

    ``min_features``: a Linear only starts a column-parallel pair when its
    out_features is at least this and divisible by the axis size — keeps
    attention MLPs / class heads replicated."""
    tp = mesh.shape[axis]
    if tp == 1:
        return jax.tree_util.tree_map(lambda _: P(), params)

    def walk(node):
        if _is_symmetric(node):
            return _symmetric_specs(node, tp, axis, min_features)
        if _is_sequential(node) and any(
                _is_linear(v) for v in node.values()):
            return _chain_specs(node, tp, axis, min_features)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return jax.tree_util.tree_map(lambda _: P(), node)

    return walk(params)


def shard_pytree(mesh, tree, specs):
    """device_put each leaf with NamedSharding(mesh, spec) — commits the
    shardings so a later jit (no explicit in_shardings) respects them."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def make_tp_train_step(model, optimizer, mesh, *, label_smoothing=0.1,
                       regularizer=None, augment_fn=None):
    """jit'd step(params, model_state, opt_state, images, labels, rng) for a
    DP×TP mesh: batch sharded over 'data', FC params over 'model'.

    Same step body as make_dp_train_step (data_parallel.py); only the
    sharding mechanism differs.  Shardings ride on the *committed* inputs
    (shard_pytree/device_put), not on explicit in_shardings — optimizer
    state initialized with ``jax.jit(optimizer.init)(sharded_params)``
    inherits the param layout, and GSPMD propagates everything else (the
    row-parallel psum, the DP gradient all-reduce, BN stat gathers)."""
    batch_s = NamedSharding(mesh, P("data"))
    step = make_train_step_body(model, optimizer,
                                label_smoothing=label_smoothing,
                                regularizer=regularizer,
                                augment_fn=augment_fn)
    jitted = jax.jit(step)

    def run(params, model_state, opt_state, images, labels, rng):
        images = jax.device_put(images, batch_s)
        labels = jax.device_put(labels, batch_s)
        return jitted(params, model_state, opt_state, images, labels, rng)

    run.jitted = jitted
    return run
