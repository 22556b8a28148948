"""Checkpoint / resume (the reference saves only a best-model state_dict at
emotion_recognition.py:363 and has no resume path — this module does both,
including optimizer state and step counter).

Two interchangeable on-disk backends:
  * ``pickle``  — single-file numpy payload (default; dependency-light,
                  atomic via tmp+rename);
  * ``orbax``   — orbax.checkpoint PyTree directory format (async-capable,
                  the production JAX ecosystem standard; multi-host-aware).
                  Leaves are stored FLAT (keyed "000", "001", …) because
                  orbax does not round-trip custom pytree nodes (optax's
                  namedtuple states); ``restore_state`` unflattens against
                  the live TrainState's treedef.
The backend is auto-detected on load, so checkpoints written either way
restore through the same ``restore_state``.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

__all__ = ["save_checkpoint", "save_checkpoint_async", "wait_for_checkpoints",
           "load_checkpoint", "restore_components", "restore_state"]

_COMPONENTS = ("params", "model_state", "opt_state")


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _flat_dict(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return {f"{i:06d}": np.asarray(l) for i, l in enumerate(leaves)}


def save_checkpoint(directory, state, tag="last", backend="pickle",
                    extra=None):
    """Save params + model_state (BN stats) + opt_state + step.

    ``extra``: optional flat dict of plain numbers saved alongside (e.g.
    fit()'s best_acc/patience_count/epoch so --resume keeps best-model and
    early-stopping continuity)."""
    os.makedirs(directory, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        payload = {c: _flat_dict(getattr(state, c)) for c in _COMPONENTS}
        payload = {c: v for c, v in payload.items() if v}  # orbax: no empties
        payload["step"] = int(state.step)
        if extra:
            payload["extra"] = dict(extra)
        path = os.path.abspath(os.path.join(directory, f"{tag}.orbax"))
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
        return path
    payload = {c: _to_numpy(getattr(state, c)) for c in _COMPONENTS}
    payload["step"] = int(state.step)
    if extra:
        payload["extra"] = dict(extra)
    path = os.path.join(directory, f"{tag}.ckpt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


_ASYNC_EXECUTOR = None
_PENDING = []


def save_checkpoint_async(directory, state, tag="last", backend="pickle",
                          extra=None):
    """save_checkpoint off the training thread.

    The snapshot is taken as DEVICE-SIDE COPIES (``jnp.copy``, an async
    on-device identity — microseconds at HBM bandwidth), NOT as references
    to the live arrays: the train step/epoch functions are jitted with
    ``donate_argnums`` over params/model_state/opt_state, so the next
    dispatch after this call invalidates the original buffers — a worker
    fetching a donated leaf would die with 'Array has been deleted'.  The
    copies are owned by nobody else, so the worker's device→host fetch and
    disk write overlap training safely.  A single worker serializes saves
    (last writer wins per tag, as in the sync path).  Returns a Future;
    call ``wait_for_checkpoints()`` before reading the files or exiting."""
    import concurrent.futures
    import types

    import jax.numpy as jnp

    global _ASYNC_EXECUTOR
    if _ASYNC_EXECUTOR is None:
        _ASYNC_EXECUTOR = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")

    def _device_copy(tree):
        return jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else np.array(x),
            tree)

    snapshot = types.SimpleNamespace(
        step=int(state.step),
        **{c: _device_copy(getattr(state, c)) for c in _COMPONENTS})
    fut = _ASYNC_EXECUTOR.submit(save_checkpoint, directory, snapshot,
                                 tag, backend, extra)
    _PENDING.append(fut)
    return fut


def wait_for_checkpoints():
    """Block until every async save has landed; re-raises the first failure.
    Returns the number of saves waited on."""
    global _PENDING
    pending, _PENDING = _PENDING, []
    for fut in pending:
        fut.result()
    return len(pending)


def load_checkpoint(directory, tag="last"):
    """Load a checkpoint written by either backend (auto-detected).
    Pickle payloads hold full trees; orbax payloads hold flat leaf dicts
    (consumed by restore_state)."""
    orbax_path = os.path.abspath(os.path.join(directory, f"{tag}.orbax"))
    pickle_path = os.path.join(directory, f"{tag}.ckpt")
    have_orbax = os.path.isdir(orbax_path)
    have_pickle = os.path.exists(pickle_path)
    if have_orbax and have_pickle:
        # both backends present (e.g. the backend flag changed between
        # runs): take the newer one rather than silently preferring a
        # stale file
        use_orbax = os.path.getmtime(orbax_path) >= os.path.getmtime(
            pickle_path)
        import warnings

        warnings.warn(
            f"checkpoint dir {directory!r} holds both {tag}.ckpt and "
            f"{tag}.orbax; loading the newer "
            f"({'orbax' if use_orbax else 'pickle'})", stacklevel=2)
    else:
        use_orbax = have_orbax
    if use_orbax:
        import orbax.checkpoint as ocp

        payload = dict(ocp.PyTreeCheckpointer().restore(orbax_path))
        payload["step"] = int(np.asarray(payload["step"]))
        if "extra" in payload:
            payload["extra"] = {k: float(np.asarray(v))
                                for k, v in dict(payload["extra"]).items()}
        payload["_flat"] = True
        return payload
    with open(pickle_path, "rb") as f:
        return pickle.load(f)


def _restore_tree(target, stored, flat):
    if flat:
        leaves = [jax.numpy.asarray(stored[k])
                  for k in sorted(stored, key=int)] if stored else []
        treedef = jax.tree_util.tree_structure(target)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.tree_util.tree_map(
        lambda t, s: jax.numpy.asarray(s), target, stored)


def restore_components(payload, targets):
    """Restore selected components from a load_checkpoint payload against
    live target pytrees: ``targets`` maps component name (from _COMPONENTS)
    to its template tree; returns {name: restored_tree}.  Shared by
    restore_state and the serve CLI (which has no opt_state to restore)."""
    flat = payload.get("_flat", False)
    out = {}
    for c, target in targets.items():
        # flat (orbax) payloads legitimately drop EMPTY components at save
        # time; pickle payloads must contain every component — a missing
        # key means a truncated/foreign file and must fail loudly
        stored = payload.get(c, {}) if flat else payload[c]
        out[c] = _restore_tree(target, stored, flat)
    return out


def restore_state(state, directory, tag="last"):
    """Restore in place into a TrainState created with the same model/optimizer
    (resume path — absent in the reference)."""
    payload = load_checkpoint(directory, tag)
    restored = restore_components(
        payload, {c: getattr(state, c) for c in _COMPONENTS})
    for c, tree in restored.items():
        setattr(state, c, tree)
    state.step = payload["step"]
    return state
