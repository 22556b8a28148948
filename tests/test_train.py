"""Train engine tests: losses/schedules vs torch oracles, optimizer groups,
end-to-end loss decrease, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.data import load_dataset
from cnn_pde_tpu.models import MNISTClassifier
from cnn_pde_tpu.nn import Linear, param_path_items
from cnn_pde_tpu.train import (
    ParamGroup,
    TrainConfig,
    Trainer,
    build_optimizer,
    cross_entropy,
    hybrid_pde_regularization,
    restore_state,
    save_checkpoint,
)
from cnn_pde_tpu.train.schedules import cosine_annealing, onecycle

torch = pytest.importorskip("torch")


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((16, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 16)
    for ls in (0.0, 0.1):
        ref = torch.nn.CrossEntropyLoss(label_smoothing=ls)(
            torch.from_numpy(logits), torch.from_numpy(labels)).item()
        out = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ls))
        assert abs(out - ref) < 1e-5, (ls, out, ref)


def test_cosine_schedule_matches_torch():
    base, t_max = 0.002, 5
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(model.parameters(), lr=base)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max)
    ref = []
    for _ in range(8):
        ref.append(opt.param_groups[0]["lr"])
        sched.step()
    f = cosine_annealing(base, t_max, steps_per_epoch=10)
    ours = [float(f(e * 10 + 3)) for e in range(8)]
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_onecycle_schedule_matches_torch():
    total = 100
    model = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(model.parameters(), lr=0.01)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=0.01, total_steps=total, pct_start=0.3,
        anneal_strategy="cos")
    ref = []
    for _ in range(total):
        ref.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    f = onecycle(0.01, total, pct_start=0.3)
    ours = [float(f(s)) for s in range(total)]
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=1e-5)


def test_param_group_lr_scaling(key):
    """α-group must receive full LR, the default ('rest') group scaled LR —
    mirrors cifar10.py:431-434."""
    params = {"alpha_base": jnp.ones((4,)), "w": jnp.ones((4,))}
    grads = {"alpha_base": jnp.ones((4,)), "w": jnp.ones((4,))}
    opt = build_optimizer(params, lambda s: 1e-1,
                          groups=(ParamGroup(("alpha",), 1.0, 0.0),),
                          default_weight_decay=0.0, default_lr_scale=0.5,
                          clip_norm=None)
    st = opt.init(params)
    updates, _ = opt.update(grads, st, params)
    # AdamW first step: update magnitude ≈ lr·scale
    a, w = abs(float(updates["alpha_base"][0])), abs(float(updates["w"][0]))
    assert abs(a - 0.1) < 0.01 and abs(w - 0.05) < 0.005


def test_hybrid_regularizer_selects_paths(key):
    params = {
        "diff": {"alpha_base": jnp.ones((2, 2)),
                 "channel_mixing": jnp.eye(2) * 2.0},
        "combination_weights": jnp.asarray([1.0, -1.0]),
        "parabolic": {"sym": {"K": {"w": jnp.ones((3, 3))}}},
        "head": {"w": jnp.ones((5, 5))},
    }
    reg = float(hybrid_pde_regularization(params, alpha1=1.0, alpha2=1.0,
                                          alpha3=1.0))
    # alpha_base: 4·1=4; mixing: ‖2I−I‖²=2; weights L1: 2; K: 9; head: 0
    assert abs(reg - (4 + 2 + 2 + 9)) < 1e-5


def test_smoke_training_loss_decreases(key, tmp_path):
    """5 steps of real training on synthetic MNIST must reduce loss."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=12, synthetic_test_per_class=4)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=3, batch_size=32, label_smoothing=0.1,
                      log_every=1000)
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(key, None)
    h1 = trainer.train_epoch(state, ds, 0, verbose=False)
    h3 = None
    for e in (1, 2):
        h3 = trainer.train_epoch(state, ds, e, verbose=False)
    assert h3["loss"] < h1["loss"]
    ev = trainer.evaluate(state, ds)
    assert ev["acc"] > 15.0  # 10 classes, must beat chance after 3 epochs

    # checkpoint round-trip
    save_checkpoint(str(tmp_path), state, tag="best")
    state2 = trainer.init_state(jax.random.PRNGKey(123), None)
    restore_state(state2, str(tmp_path), tag="best")
    ev2 = trainer.evaluate(state2, ds)
    assert abs(ev2["acc"] - ev["acc"]) < 1e-6
    assert state2.step == state.step


def test_fit_lifecycle_early_stop_and_best_checkpoint(key, tmp_path):
    """fit() end-to-end: eval cadence, best-acc checkpointing, early stop
    (the emotion loop's lifecycle — emotion_recognition.py:339-369)."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=6, batch_size=16, eval_every=1,
                      early_stop_patience=2, log_every=10**9)
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(key, None)
    result = trainer.fit(state, ds, verbose=False,
                         checkpoint_dir=str(tmp_path))
    assert result["best_acc"] > 0.0
    assert 1 <= len(result["history"]) <= 6
    # best checkpoint exists and reloads to the recorded best accuracy
    state2 = trainer.init_state(jax.random.PRNGKey(9), None)
    restore_state(state2, str(tmp_path), tag="best")
    ev = trainer.evaluate(state2, ds)
    assert abs(ev["acc"] - result["best_acc"]) < 1e-6


def test_checkpoint_orbax_backend_roundtrip(tmp_path, key):
    """Orbax-backend checkpoints must restore through the same
    restore_state, including optax's namedtuple opt_state structure."""
    pytest.importorskip("orbax.checkpoint")
    from cnn_pde_tpu.utils.config import get_preset

    model = MNISTClassifier()
    preset = get_preset("mnist")
    trainer = Trainer(model, preset.make_train_config(batch_size=8),
                      preset.make_schedule(steps_per_epoch=10))
    state = trainer.init_state(key, None)
    state.step = 17
    save_checkpoint(str(tmp_path), state, tag="best", backend="orbax")

    state2 = trainer.init_state(jax.random.PRNGKey(99), None)
    restore_state(state2, str(tmp_path), tag="best")
    assert state2.step == 17
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.tree_util.tree_structure(state2.opt_state) == \
        jax.tree_util.tree_structure(state.opt_state)


def test_checkpoint_mixed_backends_prefers_newer(tmp_path, key):
    """When a dir holds both backend formats (backend flag changed between
    runs), restore must take the NEWER checkpoint, not silently prefer
    pickle."""
    import os
    import time as _time

    pytest.importorskip("orbax.checkpoint")
    from cnn_pde_tpu.utils.config import get_preset

    model = MNISTClassifier()
    preset = get_preset("mnist")
    trainer = Trainer(model, preset.make_train_config(batch_size=8),
                      preset.make_schedule(steps_per_epoch=10))
    state = trainer.init_state(key, None)
    state.step = 1
    save_checkpoint(str(tmp_path), state, tag="best")            # pickle
    state.step = 99
    p = save_checkpoint(str(tmp_path), state, tag="best", backend="orbax")
    # ensure a strictly newer mtime even on coarse filesystems
    os.utime(p, (os.path.getatime(p), _time.time() + 2))

    state2 = trainer.init_state(jax.random.PRNGKey(5), None)
    with pytest.warns(UserWarning, match="holds both"):
        restore_state(state2, str(tmp_path), tag="best")
    assert state2.step == 99


def test_device_epoch_matches_host_loop(key):
    """TrainConfig.device_epoch (whole epoch in one lax.scan dispatch) must
    reproduce the per-batch host loop: same permutation stream, same step
    rngs, same batches -> (near-)identical parameters and epoch stats."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=12, synthetic_test_per_class=4)
    model = MNISTClassifier()

    def run(device_epoch):
        cfg = TrainConfig(epochs=2, batch_size=32, log_every=10**9,
                          device_epoch=device_epoch)
        trainer = Trainer(model, cfg, lambda s: 1e-3)
        state = trainer.init_state(key, None)
        stats = [trainer.train_epoch(state, ds, e, verbose=False)
                 for e in range(2)]
        return state, stats

    s_host, h_host = run(False)
    s_dev, h_dev = run(True)
    assert s_host.step == s_dev.step
    for a, b in zip(jax.tree_util.tree_leaves(s_host.params),
                    jax.tree_util.tree_leaves(s_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6)
    for hh, hd in zip(h_host, h_dev):
        assert abs(hh["loss"] - hd["loss"]) < 1e-5
        assert abs(hh["acc"] - hd["acc"]) < 1e-3


def test_device_epoch_small_dataset_noop(key):
    """A train split smaller than one batch must be a safe no-op."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=1, synthetic_test_per_class=1)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=1, batch_size=64, device_epoch=True)
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(key, None)
    stats = trainer.train_epoch(state, ds, 0, verbose=False)
    assert stats["time"] == 0.0 and state.step == 0


def test_device_eval_matches_host_eval(key):
    """The scanned one-dispatch eval (device_epoch mode) must produce the
    same accuracy and predictions as the per-batch host eval, including the
    padded last batch (test split not a multiple of eval_bs)."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=6, synthetic_test_per_class=5)
    assert ds.test_images.shape[0] % 16 != 0  # exercises the padding path
    model = MNISTClassifier()
    state = Trainer(model, TrainConfig(batch_size=16), lambda s: 1e-3
                    ).init_state(key, None)

    ev_host = Trainer(model, TrainConfig(batch_size=16), lambda s: 1e-3
                      ).evaluate(state, ds)
    ev_dev = Trainer(model, TrainConfig(batch_size=16, device_epoch=True),
                     lambda s: 1e-3).evaluate(state, ds)
    assert ev_host["acc"] == ev_dev["acc"]
    np.testing.assert_array_equal(ev_host["predictions"],
                                  ev_dev["predictions"])
    np.testing.assert_array_equal(ev_host["labels"], ev_dev["labels"])


def test_device_epoch_bn_model_matches_host_loop(key):
    """BN running stats thread through the scan carry: a BN+dropout model
    (Fashion head) must produce the same params AND model_state either way."""
    from cnn_pde_tpu.models import FashionClassifier

    ds = load_dataset("fashion_mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=2)
    model = FashionClassifier()

    def run(device_epoch):
        cfg = TrainConfig(epochs=1, batch_size=16, log_every=10**9,
                          device_epoch=device_epoch)
        trainer = Trainer(model, cfg, lambda s: 1e-3)
        state = trainer.init_state(key, None)
        trainer.train_epoch(state, ds, 0, verbose=False)
        return state

    s_host, s_dev = run(False), run(True)
    for a, b in zip(jax.tree_util.tree_leaves(s_host.params),
                    jax.tree_util.tree_leaves(s_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_host.model_state),
                    jax.tree_util.tree_leaves(s_dev.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6)


def test_max_steps_per_epoch_caps_both_paths(key):
    """The cap must apply to the host loop AND the device epoch, and yield
    the same parameters (same first-k batches of the same permutation)."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=12, synthetic_test_per_class=2)
    model = MNISTClassifier()

    def run(device_epoch):
        cfg = TrainConfig(epochs=1, batch_size=16, log_every=10**9,
                          device_epoch=device_epoch, max_steps_per_epoch=2)
        trainer = Trainer(model, cfg, lambda s: 1e-3)
        state = trainer.init_state(key, None)
        trainer.train_epoch(state, ds, 0, verbose=False)
        return state

    s_host, s_dev = run(False), run(True)
    assert s_host.step == s_dev.step == 2  # capped (7 full batches exist)
    for a, b in zip(jax.tree_util.tree_leaves(s_host.params),
                    jax.tree_util.tree_leaves(s_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6)


def test_device_epoch_falls_back_without_train_arrays(key):
    """A duck-typed dataset exposing only train_batches/eval_batches must
    still work with device_epoch=True (host-loop fallback, no AttributeError)."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=4, synthetic_test_per_class=2)

    class MinimalDataset:
        def train_batches(self, bs, seed=0, **kw):
            return ds.train_batches(bs, seed=seed)

        def eval_batches(self, bs, split="test"):
            return ds.eval_batches(bs, split=split)

    model = MNISTClassifier()
    cfg = TrainConfig(epochs=1, batch_size=16, log_every=10**9,
                      device_epoch=True)
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(key, None)
    stats = trainer.train_epoch(state, MinimalDataset(), 0, verbose=False)
    assert state.step > 0 and np.isfinite(stats["loss"])
    ev = trainer.evaluate(state, MinimalDataset())
    assert 0.0 <= ev["acc"] <= 100.0


def test_multi_epoch_dispatch_matches_per_epoch(key):
    """fit() with device_epoch fuses all epochs between eval points into one
    dispatch; streams must be identical to dispatching per epoch (same
    per-epoch losses, same final params/BN state, same evals)."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()

    def run(fuse):
        cfg = TrainConfig(epochs=5, batch_size=16, eval_every=2,
                          log_every=10**9, device_epoch=True,
                          multi_epoch_dispatch=fuse)
        trainer = Trainer(model, cfg, lambda s: 1e-3)
        state = trainer.init_state(key, None)
        result = trainer.fit(state, ds, verbose=False)
        return state, result

    s_fuse, r_fuse = run(True)
    s_ref, r_ref = run(False)
    assert s_fuse.step == s_ref.step
    assert len(r_fuse["history"]) == len(r_ref["history"]) == 5
    for a, b in zip(r_fuse["history"], r_ref["history"]):
        assert abs(a["loss"] - b["loss"]) < 1e-5
        assert a.get("test_acc") == b.get("test_acc")
    assert r_fuse["best_acc"] == r_ref["best_acc"]
    for a, b in zip(jax.tree_util.tree_leaves(s_fuse.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6)


def test_native_loader_warning_fires_on_fused_fit(key):
    """native_loader + device_epoch silently bypasses the C++ batcher; the
    one-time warning must fire on the DEFAULT fused multi-epoch fit path
    (it used to live only in train_epoch, which fit() bypasses)."""
    import warnings

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=4, synthetic_test_per_class=2)
    cfg = TrainConfig(epochs=1, batch_size=16, device_epoch=True,
                      native_loader=True, log_every=10**9)
    trainer = Trainer(MNISTClassifier(), cfg, lambda s: 1e-3)
    state = trainer.init_state(key, None)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        trainer.fit(state, ds, verbose=False)
    assert any("native loader" in str(w.message) for w in caught)


def test_async_checkpoint_roundtrip_and_isolation(key, tmp_path):
    """save_checkpoint_async: the snapshot is of the state at submit time
    (later mutation of the TrainState must not leak in), the write lands
    after wait_for_checkpoints, and fit(checkpoint_async=True) produces a
    restorable best checkpoint."""
    from cnn_pde_tpu.train.checkpoint import (save_checkpoint_async,
                                              wait_for_checkpoints)

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=2, batch_size=16, eval_every=1, log_every=10**9)
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(key, None)

    leaf_path = jax.tree_util.tree_leaves(state.params)[0]
    before = np.asarray(leaf_path).copy()
    save_checkpoint_async(str(tmp_path / "a"), state, tag="best")
    # mutate the TrainState binding AFTER submit: snapshot must not follow
    state.params = jax.tree_util.tree_map(lambda x: x + 1000.0, state.params)
    state.step = 777
    assert wait_for_checkpoints() == 1
    state2 = trainer.init_state(jax.random.PRNGKey(5), None)
    restore_state(state2, str(tmp_path / "a"), tag="best")
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]), before)
    assert state2.step != 777

    # end-to-end through fit()
    state3 = trainer.init_state(jax.random.PRNGKey(6), None)
    result = trainer.fit(state3, ds, verbose=False,
                         checkpoint_dir=str(tmp_path / "b"),
                         checkpoint_async=True)
    state4 = trainer.init_state(jax.random.PRNGKey(7), None)
    restore_state(state4, str(tmp_path / "b"), tag="best")
    ev = trainer.evaluate(state4, ds)
    assert abs(ev["acc"] - result["best_acc"]) < 1e-6


def test_periodic_checkpoint_and_epoch_resume(key, tmp_path):
    """Fault tolerance: checkpoint_every saves a rolling 'last' checkpoint;
    a restarted fit() derives the completed-epoch count from the restored
    step and continues from there (not from scratch)."""
    from cnn_pde_tpu.train.checkpoint import load_checkpoint

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=4, batch_size=16, eval_every=1, log_every=10**9)
    trainer = Trainer(model, cfg, lambda s: 1e-3)

    # full uninterrupted run, for the expected final step count
    full = trainer.init_state(key, None)
    trainer.fit(full, ds, verbose=False)
    total_steps = int(full.step)

    # "crashed" run: stop after 2 of 4 epochs, saving 'last' each epoch
    cfg2 = TrainConfig(epochs=2, batch_size=16, eval_every=1,
                       log_every=10**9)
    crashed = Trainer(model, cfg2, lambda s: 1e-3)
    state = crashed.init_state(key, None)
    crashed.fit(state, ds, verbose=False, checkpoint_dir=str(tmp_path),
                checkpoint_every=1)
    assert load_checkpoint(str(tmp_path), tag="last")["step"] == int(state.step)
    half_steps = int(state.step)
    assert 0 < half_steps < total_steps

    # restart with the full 4-epoch config: resumes at epoch 3
    state2 = trainer.init_state(jax.random.PRNGKey(99), None)
    restore_state(state2, str(tmp_path), tag="last")
    result = trainer.fit(state2, ds, verbose=False)
    assert int(state2.step) == total_steps          # only 2 more epochs ran
    assert len(result["history"]) == 2              # not 4


def test_resume_restores_best_acc_and_respects_step_cap(key, tmp_path):
    """Resume continuity (review findings): the rolling 'last' checkpoint
    carries best_acc/patience_count, so a resumed run must not clobber a
    better 'best' checkpoint with a worse model; and the epoch derivation
    must honor max_steps_per_epoch (--steps runs)."""
    from cnn_pde_tpu.train.checkpoint import load_checkpoint

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=2, batch_size=16, eval_every=1, log_every=10**9,
                      max_steps_per_epoch=1)
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(key, None)
    trainer.fit(state, ds, verbose=False, checkpoint_dir=str(tmp_path),
                checkpoint_every=1)
    payload = load_checkpoint(str(tmp_path), tag="last")
    extra = payload["extra"]
    assert extra["best_acc"] > 0.0
    assert int(state.step) == 2  # capped: 1 step per epoch

    # make the on-disk best artificially better than the resumed run can be
    better = extra["best_acc"] + 50.0
    payload["extra"]["best_acc"] = better
    import pickle

    with open(tmp_path / "last.ckpt", "wb") as f:
        pickle.dump(payload, f)

    best_bytes = (tmp_path / "best.ckpt").read_bytes()  # pre-crash best

    cfg3 = TrainConfig(epochs=3, batch_size=16, eval_every=1, log_every=10**9,
                       max_steps_per_epoch=1)
    trainer3 = Trainer(model, cfg3, lambda s: 1e-3)
    state3 = trainer3.init_state(jax.random.PRNGKey(7), None)
    restore_state(state3, str(tmp_path), tag="last")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        result = trainer3.fit(state3, ds, checkpoint_dir=str(tmp_path),
                              checkpoint_every=1)
    # derived start epoch honored the step cap: exactly 1 more epoch ran
    assert "Resuming at epoch 3/3" in buf.getvalue()
    assert len(result["history"]) == 1
    # the inherited best_acc was not clobbered: no eval can beat better=
    # acc+50, so fit reports it unchanged and the pre-crash 'best'
    # checkpoint file was never overwritten by the (worse) resumed model
    assert result["best_acc"] == better
    assert (tmp_path / "best.ckpt").read_bytes() == best_bytes


def test_fit_preemption_checkpoints_and_resumes(key, tmp_path):
    """Graceful preemption: fit(preemption=) stops at the next chunk
    boundary, saves the rolling 'last' checkpoint even WITHOUT
    checkpoint_every, and reports preempted=True; a --resume-style restart
    completes the remaining epochs."""
    import types

    from cnn_pde_tpu.train.checkpoint import load_checkpoint

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=4, batch_size=16, eval_every=1, log_every=10**9)
    trainer = Trainer(model, cfg, lambda s: 1e-3)

    full = trainer.init_state(key, None)
    trainer.fit(full, ds, verbose=False)
    total_steps = int(full.step)

    flag = types.SimpleNamespace(requested=True)  # preempted from the start
    state = trainer.init_state(key, None)
    result = trainer.fit(state, ds, verbose=False,
                         checkpoint_dir=str(tmp_path), preemption=flag)
    assert result["preempted"] is True
    assert len(result["history"]) == 1  # stopped at the first chunk boundary
    assert load_checkpoint(str(tmp_path),
                           tag="last")["step"] == int(state.step)

    state2 = trainer.init_state(jax.random.PRNGKey(5), None)
    restore_state(state2, str(tmp_path), tag="last")
    result2 = trainer.fit(state2, ds, verbose=False)
    assert result2["preempted"] is False
    assert int(state2.step) == total_steps
    assert len(result2["history"]) == 3  # the remaining epochs, not 4


def test_graceful_preemption_signal_latch():
    """SIGTERM latches .requested without raising; previous handler is
    restored on exit."""
    import signal
    import time as _time

    from cnn_pde_tpu.train import GracefulPreemption

    prev = signal.getsignal(signal.SIGTERM)
    with GracefulPreemption(verbose=False) as gp:
        assert not gp.requested
        os.kill(os.getpid(), signal.SIGTERM)
        for _ in range(100):  # delivery happens between bytecodes
            if gp.requested:
                break
            _time.sleep(0.01)
        assert gp.requested
    assert signal.getsignal(signal.SIGTERM) is prev


def test_grad_accum_matches_big_batch(rng, key):
    """grad_accum=k over k micro-batches must follow the same trajectory
    as one batch_size*k step: MultiSteps averages the micro-grads, then
    the full chain (clip -> AdamW) applies once."""
    from cnn_pde_tpu.nn import Flatten, Linear, Sequential

    model = Sequential([Flatten(), Linear(784, 10)])  # no dropout/BN:
    # the only rng/batch-stat effects that could break exact equivalence
    images = jnp.asarray(rng.random((32, 1, 28, 28)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, 32).astype(np.int32))

    def run(batch_size, grad_accum, n_micro):
        cfg = TrainConfig(batch_size=batch_size, grad_accum=grad_accum,
                          clip_norm=1.0, log_every=10**9)
        tr = Trainer(model, cfg, lambda s: 1e-2)
        state = tr.init_state(key, None)
        step_fn = tr._make_train_step(state.params)
        p, ms, os_ = state.params, state.model_state, state.opt_state
        for i in range(n_micro):
            lo = (i * batch_size) % 32
            p, ms, os_, loss, _ = step_fn(
                p, ms, os_, jnp.int32(i), images[lo:lo + batch_size],
                labels[lo:lo + batch_size], jax.random.PRNGKey(0))
        return p

    big = run(batch_size=32, grad_accum=1, n_micro=2)     # 2 big updates
    accum = run(batch_size=16, grad_accum=2, n_micro=4)   # 4 micro = 2 updates
    for a, b in zip(jax.tree_util.tree_leaves(accum),
                    jax.tree_util.tree_leaves(big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_bf16_moments_track_f32_adamw(rng, key):
    """moment_dtype=bfloat16 stores Adam's m/v in bf16 but must stay on
    the f32-AdamW trajectory (f32 compute, low-precision state; the
    opt-in --bf16-moments path — PERF.md §bf16-moments)."""
    import optax

    params = {"alpha_base": jnp.asarray(rng.random((8, 8)).astype(np.float32)),
              "w": jnp.asarray(rng.random((16, 4)).astype(np.float32))}
    groups = (ParamGroup(("alpha",), 1.0, 1e-6),)

    def run(moment_dtype):
        opt = build_optimizer(params, lambda s: 1e-3, groups=groups,
                              default_weight_decay=1e-4,
                              default_lr_scale=0.5, clip_norm=1.0,
                              moment_dtype=moment_dtype)
        st = opt.init(params)
        p = params
        for i in range(10):
            g = jax.tree_util.tree_map(
                lambda x: 0.01 * jnp.cos(x + i), p)
            up, st = opt.update(g, st, p)
            p = optax.apply_updates(p, up)
        return p, st

    p_lo, st_lo = run(jnp.bfloat16)
    p_hi, _ = run(None)
    # moments actually stored in bf16 (halved streaming bytes)
    lo_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(st_lo)
                 if hasattr(l, "dtype") and l.ndim > 0}
    assert jnp.dtype(jnp.bfloat16) in lo_dtypes, lo_dtypes
    # parameters stay f32 and within low-precision-Adam tolerance of the
    # exact trajectory (bf16 mantissa noise ~0.4%, halved through sqrt(v))
    for a, b in zip(jax.tree_util.tree_leaves(p_lo),
                    jax.tree_util.tree_leaves(p_hi)):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-4)


def test_bf16_moments_checkpoint_resume_preserves_dtype(key, tmp_path):
    """A --bf16-moments run must checkpoint and resume with its bf16
    moment state intact (same trajectory as an uninterrupted run)."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=2, batch_size=16, log_every=10**9,
                      moment_dtype="bfloat16")
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(key, None)
    bf16 = jnp.dtype(jnp.bfloat16)
    dtypes = {l.dtype for l in jax.tree_util.tree_leaves(state.opt_state)
              if hasattr(l, "dtype") and getattr(l, "ndim", 0) > 0}
    assert bf16 in dtypes, dtypes

    trainer.train_epoch(state, ds, 0, verbose=False)
    save_checkpoint(str(tmp_path), state, tag="last")
    state2 = trainer.init_state(jax.random.PRNGKey(7), None)
    restore_state(state2, str(tmp_path), tag="last")
    restored = {l.dtype for l in jax.tree_util.tree_leaves(state2.opt_state)
                if hasattr(l, "dtype") and getattr(l, "ndim", 0) > 0}
    assert bf16 in restored, restored
    # resumed epoch == uninterrupted second epoch (same streams)
    trainer.train_epoch(state2, ds, 1, verbose=False)
    trainer.train_epoch(state, ds, 1, verbose=False)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bn_refresh_recovers_stale_running_stats(key):
    """Precise-BN refresh (Trainer.refresh_bn_stats): BatchNorm running
    statistics are an EMA accumulated alongside the parameter trajectory and
    can go stale relative to the final params — measured eval collapse on
    the fashion preset (PARITY.md §bn-refresh: train-mode 100% / eval-mode
    30% on the same data).  The refresh recomputes stats under frozen final
    params, with eval preprocessing and dropout OFF."""
    from cnn_pde_tpu.models import FashionClassifier

    ds = load_dataset("fashion_mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=16, synthetic_test_per_class=4)
    model = FashionClassifier()
    cfg = TrainConfig(epochs=2, batch_size=32, label_smoothing=0.1,
                      log_every=1000)
    trainer = Trainer(model, cfg, lambda s: 2e-3)
    state = trainer.init_state(key, None)
    for e in range(2):
        trainer.train_epoch(state, ds, e, verbose=False)
    healthy = trainer.evaluate(state, ds)["acc"]

    # corrupt the running stats (the stale-EMA failure mode, exaggerated)
    def corrupt(path, leaf):
        name = str(path[-1])
        if "mean" in name:
            return leaf + 3.0
        if "var" in name:
            return leaf * 25.0
        return leaf

    import jax.tree_util as jtu
    state.model_state = jtu.tree_map_with_path(corrupt, state.model_state)
    broken = trainer.evaluate(state, ds)["acc"]
    assert broken < healthy  # the corruption must actually bite

    params_before = jax.tree_util.tree_leaves(state.params)
    trainer.refresh_bn_stats(state, ds, batches=66)
    # params untouched — refresh only rewrites normalization statistics
    for a, b in zip(params_before, jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    recovered = trainer.evaluate(state, ds)["acc"]
    # The refresh recomputes stationary stats of the FINAL params from
    # eval-transform activations, which need not reproduce the training-EMA
    # accuracy bit-exactly on every platform/seed — require that it recovers
    # the corruption-induced drop to within a couple of accuracy points
    # rather than >= healthy - 1e-6 (advisor r3).
    assert recovered > broken, (broken, healthy, recovered)
    assert recovered >= healthy - 2.0, (broken, healthy, recovered)

    # the refresh pass must not consume rng (dropout stays OFF): a Ctx
    # without an rng raises if any stochastic layer asks for one, and
    # FashionClassifier carries dropout(0.15) — reaching here proves it,
    # but pin it structurally too
    from cnn_pde_tpu.nn import Ctx

    ctx = Ctx(bn_stats=True)
    assert ctx.bn_stats and not ctx.train
    logits, new_state = model.apply(state.params, state.model_state,
                                    jnp.asarray(ds.test_images[:8]), ctx)
    # bn_stats mode DID update the stats pytree (not a no-op eval pass)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.model_state),
                        jax.tree_util.tree_leaves(new_state)))
    assert changed


def test_refresh_bn_stats_dataset_forms(key):
    """refresh_bn_stats accepts a dataset object OR a bare (images, labels)
    tuple, and raises a clear TypeError on anything else (advisor r3)."""
    from cnn_pde_tpu.models import FashionClassifier

    ds = load_dataset("fashion_mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=4, synthetic_test_per_class=2)
    model = FashionClassifier()
    trainer = Trainer(model, TrainConfig(epochs=1, batch_size=8),
                      lambda s: 1e-3)
    state = trainer.init_state(key, None)

    # tuple form == dataset form (same images, same seed → same stats)
    state_t = trainer.init_state(key, None)
    trainer.refresh_bn_stats(state, ds, batches=3)
    trainer.refresh_bn_stats(state_t, ds.eval_arrays(split="train"),
                             batches=3)
    for a, b in zip(jax.tree_util.tree_leaves(state.model_state),
                    jax.tree_util.tree_leaves(state_t.model_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(TypeError, match="eval_arrays"):
        trainer.refresh_bn_stats(state, object(), batches=1)
