"""Import PyTorch reference checkpoints into this framework's pytrees.

The reference saves ``model.state_dict()`` checkpoints
(emotion_recognition.py:363 — ``torch.save(model.state_dict(),
'best_model.pth')``; users of the other six scripts save the same way), so a
reference user migrating here has trained torch weights to carry over.  This
module converts a state_dict (torch tensors OR plain numpy arrays — torch is
NOT required) into ``(params, state)`` for the matching preset's model, for
every reference model family (SURVEY.md §2 M1-M13).

The two parameter spaces are structurally parallel by construction (the
full-model logits-parity tests in tests/test_reference_parity.py pin the
correspondence); the residual differences are mechanical:

* naming — per-family prefix rewrites (e.g. the reference's flat ``fc1``/
  ``bn1`` head vs our ``Sequential`` indices; ``attention_fc`` vs ``fc``);
* layout — torch ``nn.Linear.weight`` is (out, in), our ``Linear.w`` is
  (in, out): 2-D ``w`` leaves are transposed.  Conv kernels are OIHW on
  both sides (nn/layers.py::Conv2d) — copied as-is;
* BatchNorm — torch folds learnables and running stats into one namespace;
  here ``weight``/``bias`` → params ``scale``/``bias`` and
  ``running_mean``/``running_var`` → state ``mean``/``var``
  (``num_batches_tracked`` has no counterpart and is dropped);
* non-learned buffers (e.g. the emotion layer's ``pde.x``/``pde.y``
  coordinate grids, emotion_recognition.py:30-31) are reconstructed by our
  layers from hyperparameters and skipped.

Every leaf of the target pytrees must be filled exactly once with a
shape-matching source tensor — missing or extra keys raise with the full
lists, so a wrong-family checkpoint fails loudly rather than half-loading.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

import jax

__all__ = ["import_state_dict", "export_state_dict",
           "load_torch_checkpoint", "TORCH_KEY_REWRITES"]

# Per-preset ordered (pattern, replacement) regex rewrites taking OUR dotted
# param/state paths to the reference's state_dict namespace.  The leaf-name
# translation (w/b/scale/mean/var) is uniform and handled separately.
TORCH_KEY_REWRITES = {
    # mnist_test.py:223-261 — diff + fc1/fc2 behind ReLU/Dropout Sequential
    "mnist": [(r"^head\.2\.", "fc1."), (r"^head\.5\.", "fc2.")],
    # fashion_mnist.py:200-254 — fc1/bn1/fc2/bn2/fc3
    "fashion_mnist": [
        (r"^head\.1\.", "fc1."), (r"^head\.2\.", "bn1."),
        (r"^head\.5\.", "fc2."), (r"^head\.6\.", "bn2."),
        (r"^head\.9\.", "fc3."),
    ],
    # SVHN.py:234-298 — five fc/bn pairs
    "svhn": [
        (r"^head\.1\.", "fc1."), (r"^head\.2\.", "bn1."),
        (r"^head\.5\.", "fc2."), (r"^head\.6\.", "bn2."),
        (r"^head\.9\.", "fc3."), (r"^head\.10\.", "bn3."),
        (r"^head\.13\.", "fc4."), (r"^head\.14\.", "bn4."),
        (r"^head\.17\.", "fc5."),
    ],
    # cifar10.py:215-361 — SpatialAttention.attention_fc, EnhancedFC.network
    "cifar10_noconv": [
        (r"\.fc\.", ".attention_fc."),
        (r"^classifier\.", "classifier.network."),
    ],
    # cifar_2version.py:190-368 — symmetric_layer, attention_net, nested
    # PDEClassifier.classifier
    "cifar10_hybrid": [
        (r"\.sym\.", ".symmetric_layer."),
        (r"^attention\.net\.", "attention.attention_net."),
        (r"^classifier\.", "classifier.classifier."),
    ],
    # emotion_recognition.py:16-140 — PDELayer 'pde', head 'classifier'
    "emotion": [(r"^diff\.", "pde."), (r"^head\.", "classifier.")],
    # tiny_imagenet.py:237-331 — BasicBlock downsample Sequential
    "tiny_imagenet": [
        (r"\.sc_conv\.", ".shortcut.0."),
        (r"\.sc_bn\.", ".shortcut.1."),
    ],
}

# torch buffers with no counterpart here (reconstructed from hyperparameters
# or simply untracked).
_SKIP_SUFFIXES = ("num_batches_tracked",)
_SKIP_KEYS = {"emotion": {"pde.x", "pde.y"}}


def _to_numpy(v):
    """torch.Tensor (CPU), np.ndarray, or anything np.asarray handles."""
    detach = getattr(v, "detach", None)
    if detach is not None:  # torch tensor without importing torch
        v = detach()
        if hasattr(v, "cpu"):
            v = v.cpu()
    return np.asarray(v)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}.{k}" if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def _rebuild(template, flat, prefix=""):
    """Nested tree shaped like ``template`` with leaves from ``flat`` (keyed
    by the same dotted paths _flatten generates — robust to dict keys that
    themselves contain dots, e.g. tiny_imagenet's 'layer1.0')."""
    if isinstance(template, dict):
        return {k: _rebuild(v, flat, f"{prefix}.{k}" if prefix else str(k))
                for k, v in template.items()}
    return flat[prefix]


def _torch_key(path, rewrites, *, is_state):
    """Translate OUR dotted path to the reference's state_dict key."""
    for pat, rep in rewrites:
        new = re.sub(pat, rep, path)
        if new != path:
            path = new
            break
    head, _, leaf = path.rpartition(".")
    if is_state:
        leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
    else:
        leaf = {"w": "weight", "b": "bias", "scale": "weight"}.get(leaf, leaf)
    return f"{head}.{leaf}" if head else leaf


def import_state_dict(state_dict, preset):
    """Convert a reference ``model.state_dict()`` to ``(params, state)``.

    ``state_dict``: mapping of torch keys to tensors/arrays (values may be
    torch CPU tensors — converted without importing torch — or numpy).
    ``preset``: preset name (utils.config.get_preset) naming the family, or
    a ready model instance.  Returns pytrees accepted by
    ``model.apply`` / ``Trainer`` / ``serve.make_predict_fn``.
    """
    from ..models import MODEL_REGISTRY
    from ..utils.config import get_preset

    if isinstance(preset, str):
        cfg = get_preset(preset)
        model = MODEL_REGISTRY[cfg.model](**cfg.model_kwargs)
        name = preset
    else:  # a model instance; find its family for the rewrite table
        model = preset
        by_cls = {MODEL_REGISTRY[get_preset(n).model]: n
                  for n in TORCH_KEY_REWRITES}
        name = by_cls[type(model)]
    rewrites = TORCH_KEY_REWRITES[name]

    params0, state0 = model.init(jax.random.PRNGKey(0))
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    used = set()

    def fill(flat0, *, is_state):
        out = {}
        for path, leaf0 in flat0.items():
            tk = _torch_key(path, rewrites, is_state=is_state)
            if tk not in sd:
                raise KeyError(
                    f"{name}: our leaf '{path}' maps to state_dict key "
                    f"'{tk}' which is absent; checkpoint keys: "
                    f"{sorted(sd)[:8]}...")
            v = sd[tk]
            used.add(tk)
            if (not is_state and path.rsplit(".", 1)[-1] == "w"
                    and v.ndim == 2):
                v = v.T  # torch Linear (out, in) -> ours (in, out)
            if v.shape != leaf0.shape:
                raise ValueError(
                    f"{name}: shape mismatch at '{path}' <- '{tk}': "
                    f"checkpoint {v.shape} vs model {leaf0.shape}")
            out[path] = jnp.asarray(np.ascontiguousarray(v),
                                    dtype=leaf0.dtype)
        return out

    params = _rebuild(params0, fill(_flatten(params0), is_state=False))
    state = _rebuild(state0, fill(_flatten(state0), is_state=True))

    skip = _SKIP_KEYS.get(name, set())
    extra = [k for k in sd if k not in used
             and not k.endswith(_SKIP_SUFFIXES) and k not in skip]
    if extra:
        raise ValueError(
            f"{name}: {len(extra)} checkpoint keys were not consumed "
            f"(wrong family or architecture mismatch): {extra[:10]}")
    return params, state


def export_state_dict(params, state, preset):
    """The inverse of ``import_state_dict``: our ``(params, state)`` as a
    reference-layout state_dict of numpy arrays (Linear weights transposed
    back to (out, in), BN params/state re-merged, plus zero
    ``num_batches_tracked`` counters so ``ref_model.load_state_dict`` needs
    no ``strict=False``).  ``torch.save(export_state_dict(...), path)``
    produces a checkpoint the reference scripts load directly — migration
    works in BOTH directions.

    Buffers our layers reconstruct from hyperparameters (_SKIP_KEYS, e.g.
    the emotion layer's coordinate grids) are NOT emitted — load those
    models with ``strict=False`` or keep the torch model's own buffers
    (they are input-independent constants).
    """
    rewrites = TORCH_KEY_REWRITES[preset]
    sd = {}
    for path, leaf in _flatten(params).items():
        v = np.asarray(leaf)
        if path.rsplit(".", 1)[-1] == "w" and v.ndim == 2:
            v = np.ascontiguousarray(v.T)
        sd[_torch_key(path, rewrites, is_state=False)] = v
    for path, leaf in _flatten(state).items():
        sd[_torch_key(path, rewrites, is_state=True)] = np.asarray(leaf)
        bn_prefix = _torch_key(path, rewrites, is_state=True).rsplit(
            ".", 1)[0]
        sd.setdefault(f"{bn_prefix}.num_batches_tracked",
                      np.zeros((), np.int64))
    return sd


def load_torch_checkpoint(path, preset):
    """``torch.load`` a reference checkpoint file and import it.

    Requires torch only for deserialization; accepts either a bare
    state_dict or a dict holding one under 'state_dict' / 'model'
    (common torch.save layouts)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for k in ("state_dict", "model"):
        if isinstance(obj, dict) and k in obj and isinstance(obj[k], dict):
            obj = obj[k]
            break
    return import_state_dict(obj, preset)
