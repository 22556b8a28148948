"""Model summary: parameter counts, per-subtree breakdown, output shape.

The reference prints parameter totals and PDE-group breakdowns at train
start (cifar10.py:413-420 "Total/α-β parameters", SVHN.py:310 "Model
parameters", cifar_2version.py:480-481 total + diffusion split); this is
the framework-level equivalent, shape-only (``jax.eval_shape`` — no
device compute, no weight materialization), plus a torchsummary-style
per-subtree table.
"""

from __future__ import annotations

import jax
import numpy as np

from ..nn.core import Ctx, param_path_items, tree_size

__all__ = ["model_summary", "param_group_counts", "format_summary"]

# the same substrings the grouped optimizer and regularizers select by
# (utils/config.py param-group invariant, CLAUDE.md)
PDE_GROUP_SUBSTRINGS = ("alpha", "beta", "channel_mixing",
                        "combination_weights", ".K.", "fourier")


def param_group_counts(params):
    """(total, pde_total, {substring: count}) — the reference's breakdown
    (α/β % of total, cifar10.py:420) generalized to every PDE group."""
    total = tree_size(params)
    by_group = {s: 0 for s in PDE_GROUP_SUBSTRINGS}
    pde_total = 0
    for name, leaf in param_path_items(params):
        hit = [s for s in PDE_GROUP_SUBSTRINGS if s in name or
               (s == ".K." and (name.endswith(".K") or ".K." in name))]
        if hit:
            pde_total += int(np.prod(leaf.shape)) if leaf.shape else 1
            for s in hit:
                by_group[s] += int(np.prod(leaf.shape)) if leaf.shape else 1
    return total, pde_total, {k: v for k, v in by_group.items() if v}


def model_summary(model, input_shape, *, key=None, train=False, depth=2):
    """Shape-only summary dict for ``model`` on NCHW ``input_shape``
    (including the batch dim).  ``depth`` controls how many pytree levels
    the per-subtree table descends."""
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0) if key is None else key
    params, state = jax.eval_shape(model.init, key)

    x = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
    out, _ = jax.eval_shape(
        lambda p, s, x: model.apply(p, s, x, Ctx(train=train)),
        params, state, x)

    def walk(tree, prefix, level):
        rows = []
        if isinstance(tree, dict) and level < depth and any(
                isinstance(v, dict) for v in tree.values()):
            for k in tree:
                rows += walk(tree[k], f"{prefix}.{k}" if prefix else str(k),
                             level + 1)
        else:
            rows.append((prefix or "(root)", tree_size(tree)))
        return rows

    total, pde_total, groups = param_group_counts(params)
    return {
        "input_shape": tuple(input_shape),
        "output_shape": tuple(out.shape),
        "total_params": total,
        "pde_params": pde_total,
        "pde_groups": groups,
        "state_entries": tree_size(state),
        "subtrees": walk(params, "", 0),
    }


def format_summary(s):
    """Render a model_summary() dict as the printable table."""
    lines = [f"{'subtree':<40} {'params':>12}", "-" * 53]
    for name, n in s["subtrees"]:
        lines.append(f"{name:<40} {n:>12,}")
    lines.append("-" * 53)
    lines.append(f"{'total':<40} {s['total_params']:>12,}")
    pct = (100.0 * s["pde_params"] / s["total_params"]
           if s["total_params"] else 0.0)
    lines.append(f"{'PDE (grouped) params':<40} {s['pde_params']:>12,}"
                 f"  ({pct:.1f}% of total)")
    for g, n in s["pde_groups"].items():
        lines.append(f"  {g:<38} {n:>12,}")
    lines.append(f"input {s['input_shape']} -> output {s['output_shape']}; "
                 f"state entries {s['state_entries']:,}")
    return "\n".join(lines)
