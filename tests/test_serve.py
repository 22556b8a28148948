"""Serving path tests: jit'd predict fn, export/reload round-trip, DP trainer,
class balancing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.data import load_dataset
from cnn_pde_tpu.data.pipeline import balance_classes
from cnn_pde_tpu.models import MNISTClassifier
from cnn_pde_tpu.serve import export_model, load_exported, make_predict_fn
from cnn_pde_tpu.train import TrainConfig, Trainer


def test_predict_fn_modes(rng, key):
    model = MNISTClassifier()
    params, state = model.init(key)
    x = jnp.asarray(rng.random((4, 1, 28, 28)).astype(np.float32))
    logits = make_predict_fn(model, params, state)(x)
    probs = make_predict_fn(model, params, state, output="probs")(x)
    labels = make_predict_fn(model, params, state, output="labels")(x)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.asarray(logits).argmax(-1))


def test_export_reload_round_trip(rng, key, tmp_path):
    model = MNISTClassifier()
    params, state = model.init(key)
    x = jnp.asarray(rng.random((2, 1, 28, 28)).astype(np.float32))
    ref = make_predict_fn(model, params, state)(x)

    path = str(tmp_path / "model.stablehlo")
    export_model(model, params, state, x, path)
    restored = load_exported(path)
    out = restored(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_balance_classes():
    labels = np.array([0, 0, 0, 1, 1, 2, 0, 2, 2, 2])
    images = np.arange(10, dtype=np.float32)[:, None]
    bi, bl = balance_classes(images, labels)
    assert np.bincount(bl).tolist() == [2, 2, 2]
    # original order preserved: first two of each class
    assert bi[:2].ravel().tolist() == [0.0, 1.0]


def test_trainer_with_mesh(key):
    from cnn_pde_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=10, synthetic_test_per_class=4)
    mesh = make_mesh(spatial=1)
    trainer = Trainer(MNISTClassifier(),
                      TrainConfig(epochs=1, batch_size=16, log_every=10**9),
                      lambda s: 1e-3, mesh=mesh)
    state = trainer.init_state(key, None)
    stats = trainer.train_epoch(state, ds, 0, verbose=False)
    assert np.isfinite(stats["loss"])
    ev = trainer.evaluate(state, ds)
    assert 0.0 <= ev["acc"] <= 100.0


def test_cache_hoisted_operators(rng, key):
    """Frozen-params serving: pinning the hoisted sweep operators must not
    change predictions (f32 operators — exact same computation, hoisted out
    of the graph), must refuse train-mode applies, and must clear."""
    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.serve import cache_hoisted_operators, clear_operator_cache

    model = CIFAR10PDENoConv()
    for pde in model.extractor.pdes:
        pde.hoisted = True  # f32 operators: CPU-safe, numerically identical
    params, state = model.init(key)
    x = jnp.asarray(rng.random((3, 3, 32, 32)).astype(np.float32))
    ref = make_predict_fn(model, params, state)(x)

    n = cache_hoisted_operators(model, params, state, x)
    assert n == 3
    assert all(pde.operator_cache is not None for pde in model.extractor.pdes)
    out = make_predict_fn(model, params, state)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)

    # training with a pinned cache must refuse (stale-cache hazard)
    with pytest.raises(ValueError, match="operator_cache"):
        model.apply(params, state, x,
                    __import__("cnn_pde_tpu.nn.core", fromlist=["Ctx"]).Ctx(
                        train=True, rng=key))

    assert clear_operator_cache(model) == 3
    # a non-hoisted model is a no-op
    plain = CIFAR10PDENoConv()
    assert cache_hoisted_operators(plain, params, state, x) == 0


def test_dp_predict_matches_single_device(rng, key):
    """make_predict_fn(mesh=) shards the request batch over 'data'; the
    predictions must equal the single-device path exactly."""
    from cnn_pde_tpu.parallel.mesh import make_mesh

    model = MNISTClassifier()
    params, state = model.init(key)
    x = jnp.asarray(rng.random((16, 1, 28, 28)).astype(np.float32))
    ref = make_predict_fn(model, params, state, output="probs")(x)

    mesh = make_mesh(spatial=1)
    out = make_predict_fn(model, params, state, output="probs", mesh=mesh)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)
    lbl = make_predict_fn(model, params, state, output="labels", mesh=mesh)(x)
    np.testing.assert_array_equal(np.asarray(lbl),
                                  np.asarray(ref).argmax(-1))


def test_serve_cli_roundtrip(tmp_path):
    """Serve CLI end-to-end: train 1 epoch saving a best checkpoint, then
    restore + predict on a saved batch + export StableHLO; the exported
    artifact must reload and agree with the CLI's predictions."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = tmp_path / "ckpt"
    out = subprocess.run(
        [sys.executable, "-m", "cnn_pde_tpu.train", "--preset", "mnist",
         "--synthetic", "--epochs", "1", "--checkpoint-dir", str(ckpt),
         "--platform", "cpu", "--quiet"],
        cwd=repo, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]

    batch = np.random.default_rng(0).random((4, 1, 28, 28)).astype(np.float32)
    np.save(tmp_path / "batch.npy", batch)
    export_path = tmp_path / "model.stablehlo"
    out = subprocess.run(
        [sys.executable, "-m", "cnn_pde_tpu.serve", "--preset", "mnist",
         "--checkpoint-dir", str(ckpt), "--input", str(tmp_path / "batch.npy"),
         "--export", str(export_path), "--platform", "cpu"],
        cwd=repo, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["restored"] and len(summary["predictions"]) == 4
    assert export_path.stat().st_size > 0

    restored = load_exported(str(export_path))
    logits = np.asarray(restored(jnp.asarray(batch)))
    assert logits.argmax(-1).tolist() == summary["predictions"]


def test_predict_fn_buckets(rng, key):
    """buckets= pads request batches to a fixed set of compiled shapes;
    results equal the unbucketed path exactly, and the model only ever
    sees bucket-sized (or over-largest) batches."""
    model = MNISTClassifier()
    params, state = model.init(key)
    ref = make_predict_fn(model, params, state)
    fn = make_predict_fn(model, params, state, buckets=(4, 16))

    seen = set()
    orig_apply = model.apply

    def spy(p, s, x, ctx):
        seen.add(int(x.shape[0]))
        return orig_apply(p, s, x, ctx)

    model.apply = spy
    try:
        for b in (1, 3, 4, 9, 16, 20):
            x = jnp.asarray(rng.random((b, 1, 28, 28)).astype(np.float32))
            # different batch shape => different executable => fusion/
            # rounding may differ in the last ulps; semantics must agree
            np.testing.assert_allclose(np.asarray(fn(x)),
                                       np.asarray(ref(x)),
                                       rtol=1e-5, atol=1e-6)
    finally:
        model.apply = orig_apply
    # 1,3,4 -> 4; 9,16 -> 16; 20 -> unpadded (above the largest bucket);
    # plus the unbucketed ref traces (1,3,9 only — 4/16/20 shapes shared)
    assert {s for s in seen if s in (4, 16, 20)} == {4, 16, 20}
    assert 9 in seen  # ref's own trace — bucketed fn never dispatched 9
