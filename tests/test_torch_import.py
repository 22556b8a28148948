"""torch-checkpoint import (cnn_pde_tpu.compat): a reference user's trained
``model.state_dict()`` must load into our pytrees and produce the same
logits the torch model does.

One test per family imports the ACTUAL reference model's state_dict (fresh
torch init — every tensor random, so any mapping/transpose error shows) and
checks eval-mode logits parity; skipped when /root/reference is absent.
A portable round-trip test (no torch needed) pins the key-rewrite mechanics.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnn_pde_tpu.compat import import_state_dict
from cnn_pde_tpu.nn import Ctx

REF = "/root/reference"

FAMILIES = [
    # (preset, reference script, reference class, input shape, tol)
    ("mnist", "mnist_test", "PDEClassifier", (4, 1, 28, 28), 1e-5),
    ("fashion_mnist", "fashion_mnist", "FashionPDEClassifier",
     (4, 1, 28, 28), 1e-5),
    ("svhn", "SVHN", "PDEClassifier", (4, 3, 32, 32), 1e-5),
    ("cifar10_noconv", "cifar10", "CIFAR10PDENoConv", (4, 3, 32, 32), 1e-5),
    ("cifar10_hybrid", "cifar_2version", "CIFAR10HybridPDEModel",
     (4, 3, 32, 32), 1e-4),
    ("emotion", "emotion_recognition", "DiffusionClassifier",
     (4, 1, 48, 48), 1e-5),
    ("tiny_imagenet", "tiny_imagenet", "ImprovedTinyImageNetClassifier",
     (2, 3, 64, 64), 1e-3),  # deep conv stack, same envelope as parity suite
]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")
@pytest.mark.parametrize("preset,script,cls,shape,tol",
                         FAMILIES, ids=[f[0] for f in FAMILIES])
def test_import_reference_state_dict_logits_parity(preset, script, cls,
                                                   shape, tol):
    torch = pytest.importorskip("torch")
    from tests.test_reference_parity import _load_ref
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.utils.config import get_preset

    ref_mod = _load_ref(script)
    torch.manual_seed(0)
    ref_model = getattr(ref_mod, cls)()
    ref_model.eval()

    params, state = import_state_dict(ref_model.state_dict(), preset)

    cfg = get_preset(preset)
    model = MODEL_REGISTRY[cfg.model](**cfg.model_kwargs)
    if preset == "cifar10_hybrid":
        # the hybrid preset's Ruthotto blocks compute in bf16 (the AMP
        # analogue the reference trains under); pin f32 so the comparison
        # isolates the weight MAPPING, exactly as the parity suite does
        ext = model.feature_extractor
        for sym in (ext.parabolic.sym, ext.hamiltonian.F_Y,
                    ext.hamiltonian.F_Z):
            sym.compute_dtype = jnp.float32
    x = np.random.default_rng(0).random(shape).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(x)).numpy()
    logits, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=tol, atol=tol)


@pytest.mark.quick
def test_round_trip_no_torch():
    """Portable mechanics check: export our mnist params into the torch key
    layout via the rewrite table, re-import, and require exact equality —
    covers rewrites, Linear transposes, and BN param/state split without
    needing torch or the reference mount."""
    from cnn_pde_tpu.compat.torch_import import (_flatten, _torch_key,
                                                 TORCH_KEY_REWRITES)
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.utils.config import get_preset

    for preset in ("mnist", "fashion_mnist"):
        cfg = get_preset(preset)
        model = MODEL_REGISTRY[cfg.model](**cfg.model_kwargs)
        params0, state0 = model.init(jax.random.PRNGKey(3))
        rw = TORCH_KEY_REWRITES[preset]

        sd = {}
        for path, leaf in _flatten(params0).items():
            v = np.asarray(leaf)
            if path.rsplit(".", 1)[-1] == "w" and v.ndim == 2:
                v = v.T
            sd[_torch_key(path, rw, is_state=False)] = v
        for path, leaf in _flatten(state0).items():
            sd[_torch_key(path, rw, is_state=True)] = np.asarray(leaf)

        params, state = import_state_dict(sd, preset)
        for (p0, l0), (p1, l1) in zip(_flatten(params0).items(),
                                      _flatten(params).items()):
            assert p0 == p1
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        for (p0, l0), (p1, l1) in zip(_flatten(state0).items(),
                                      _flatten(state).items()):
            assert p0 == p1
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_wrong_family_raises():
    with pytest.raises((KeyError, ValueError)):
        import_state_dict({"fc1.weight": np.zeros((2, 2))}, "mnist")


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")
@pytest.mark.parametrize("preset,script,cls,shape,tol",
                         [f for f in FAMILIES
                          if f[0] in ("mnist", "svhn", "emotion")],
                         ids=lambda f: str(f))
def test_export_loads_into_reference_model(preset, script, cls, shape, tol):
    """The REVERSE direction: our trained weights exported to the torch
    layout must load_state_dict into the actual reference model and give
    the same logits — migration works both ways."""
    torch = pytest.importorskip("torch")
    from tests.test_reference_parity import _load_ref
    from cnn_pde_tpu.compat import export_state_dict
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.utils.config import get_preset

    cfg = get_preset(preset)
    model = MODEL_REGISTRY[cfg.model](**cfg.model_kwargs)
    params, state = model.init(jax.random.PRNGKey(11))

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, state, preset).items()}
    ref_mod = _load_ref(script)
    torch.manual_seed(0)
    ref_model = getattr(ref_mod, cls)()
    # strict=False only tolerates buffers our layers reconstruct from
    # hyperparameters (emotion's coordinate grids) — assert exactly that
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(k in ("pde.x", "pde.y") for k in missing), missing
    ref_model.eval()

    x = np.random.default_rng(1).random(shape).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(x)).numpy()
    logits, _ = model.apply(params, state, jnp.asarray(x), Ctx(train=False))
    # random-init emotion logits reach ~2e4, so compare relatively:
    # accumulation-order noise scales with magnitude (a mapping error
    # would be orders of magnitude larger)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=1e-4, atol=tol)
