"""Inference / serving path.

The reference has no serve or export story (SURVEY.md §3.5 — inference exists
only as in-loop eval).  Here:

* ``make_predict_fn`` — a jit'd eval-mode callable (logits / probs / labels).
* ``export_model`` / ``load_exported`` — ahead-of-time serialization via
  jax.export (StableHLO): the exported artifact reloads and runs without the
  model-building Python code, the TPU-native analogue of torchscript/ONNX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .nn.core import Ctx

__all__ = ["make_predict_fn", "export_model", "load_exported"]


def make_predict_fn(model, params, state, output="logits"):
    """output: 'logits' | 'probs' | 'labels'."""

    @jax.jit
    def predict(images):
        logits, _ = model.apply(params, state, images, Ctx(train=False))
        if output == "probs":
            return jax.nn.softmax(logits, axis=-1)
        if output == "labels":
            return jnp.argmax(logits, axis=-1)
        return logits

    return predict


def export_model(model, params, state, sample_images, path=None):
    """Serialize an eval-mode forward to StableHLO bytes (optionally to a
    file).  The artifact embeds the weights."""
    from jax import export as jexport

    def fwd(images):
        logits, _ = model.apply(params, state, images, Ctx(train=False))
        return logits

    exported = jexport.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(sample_images.shape, sample_images.dtype))
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Reload an exported model; returns a callable(images) -> logits."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)
    return lambda images: exported.call(images)
