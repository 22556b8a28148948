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
           "load_checkpoint", "restore_state"]

_COMPONENTS = ("params", "model_state", "opt_state")


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _flat_dict(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return {f"{i:06d}": np.asarray(l) for i, l in enumerate(leaves)}


def save_checkpoint(directory, state, tag="last", backend="pickle"):
    """Save params + model_state (BN stats) + opt_state + step."""
    os.makedirs(directory, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        payload = {c: _flat_dict(getattr(state, c)) for c in _COMPONENTS}
        payload = {c: v for c, v in payload.items() if v}  # orbax: no empties
        payload["step"] = int(state.step)
        path = os.path.abspath(os.path.join(directory, f"{tag}.orbax"))
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
        return path
    payload = {c: _to_numpy(getattr(state, c)) for c in _COMPONENTS}
    payload["step"] = int(state.step)
    path = os.path.join(directory, f"{tag}.ckpt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


_ASYNC_EXECUTOR = None
_PENDING = []


def save_checkpoint_async(directory, state, tag="last", backend="pickle"):
    """save_checkpoint off the training thread.

    JAX arrays are immutable — the training loop's next step produces NEW
    arrays, so the worker can fetch (device→host) and write the snapshot it
    was handed while training continues; neither the tunnel round trip nor
    disk IO stalls the step loop.  A single worker serializes saves (last
    writer wins per tag, as in the sync path).  Returns a Future; call
    ``wait_for_checkpoints()`` before reading the files or exiting.

    The state components are captured EAGERLY (the TrainState object itself
    is mutated by fit() on restore/rebind), so the snapshot is of the state
    at call time."""
    import concurrent.futures
    import types

    global _ASYNC_EXECUTOR
    if _ASYNC_EXECUTOR is None:
        _ASYNC_EXECUTOR = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
    snapshot = types.SimpleNamespace(
        step=int(state.step),
        **{c: getattr(state, c) for c in _COMPONENTS})
    fut = _ASYNC_EXECUTOR.submit(save_checkpoint, directory, snapshot,
                                 tag, backend)
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


def restore_state(state, directory, tag="last"):
    """Restore in place into a TrainState created with the same model/optimizer
    (resume path — absent in the reference)."""
    payload = load_checkpoint(directory, tag)
    flat = payload.get("_flat", False)
    for c in _COMPONENTS:
        # flat (orbax) payloads legitimately drop EMPTY components at save
        # time; pickle payloads must contain every component — a missing
        # key means a truncated/foreign file and must fail loudly
        stored = payload.get(c, {}) if flat else payload[c]
        setattr(state, c, _restore_tree(getattr(state, c), stored, flat))
    state.step = payload["step"]
    return state
