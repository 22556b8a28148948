"""The single jit'd train/eval engine shared by all dataset presets (L4).

Replaces the reference's seven bespoke loops (SURVEY.md §2.5) with one
``Trainer``: AdamW (optionally grouped), schedule, label-smoothed CE +
optional regularizer, global-norm clip, metrics, early stopping,
checkpoint/resume and PDE-parameter statistics logging.

TPU-first: one ``train_step`` is traced once per shape and reused for every
batch; data augmentation runs *inside* the step on device (fused by XLA into
the forward pass); metrics return as device scalars fetched once per log
interval.  Mixed precision: TPU matmuls/convs run bf16 on the MXU by default
(the XLA default — the analogue of the reference's AMP autocast at
cifar10.py:440); parameters, PDE solves and reductions stay f32.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn.core import Ctx, Module, param_path_items
from .losses import cross_entropy
from .optim import ParamGroup, build_optimizer

__all__ = ["TrainState", "Trainer", "TrainConfig"]


@dataclass
class TrainConfig:
    epochs: int = 1
    batch_size: int = 128
    eval_batch_size: Optional[int] = None
    label_smoothing: float = 0.1
    clip_norm: Optional[float] = 1.0
    weight_decay: float = 1e-4
    default_lr_scale: float = 1.0   # LR scale of the "rest" group
    param_groups: Sequence[ParamGroup] = ()
    regularizer: Optional[Callable] = None  # params -> scalar
    eval_every: int = 1          # epochs between evals (SVHN: 2, emotion: 5)
    early_stop_patience: Optional[int] = None  # emotion: 10 (in eval rounds)
    log_every: int = 100         # batches between log lines
    seed: int = 0
    native_loader: bool = False  # C++ prefetching batcher (cnn_pde_tpu.native)

    @property
    def eval_bs(self):
        return self.eval_batch_size or self.batch_size


class TrainState:
    """params + model state (BN stats) + optimizer state + step counter."""

    def __init__(self, params, model_state, opt_state, step=0):
        self.params = params
        self.model_state = model_state
        self.opt_state = opt_state
        self.step = step

    def as_dict(self):
        return {"params": self.params, "model_state": self.model_state,
                "opt_state": self.opt_state, "step": self.step}


class Trainer:
    def __init__(self, model: Module, config: TrainConfig, schedule,
                 augment_fn: Optional[Callable] = None, mesh=None):
        """augment_fn(rng, images) -> images, applied on device inside the
        jit'd train step (train batches only).

        mesh: optional jax.sharding.Mesh with a 'data' axis — enables
        data-parallel training (batch sharded, params replicated, gradient
        all-reduce inserted by XLA).  The reference is single-device
        (SURVEY.md §2.6); this is the drop-in DP upgrade."""
        self.model = model
        self.config = config
        self.schedule = schedule
        self.augment_fn = augment_fn
        self.mesh = mesh
        self._train_step = None
        self._eval_step = None

    # ---------------- initialization ----------------

    def init_state(self, key, sample_batch) -> TrainState:
        params, model_state = self.model.init(key)
        opt = self._optimizer(params)
        opt_state = opt.init(params)
        return TrainState(params, model_state, opt_state)

    def _optimizer(self, params):
        return build_optimizer(
            params, self.schedule,
            groups=self.config.param_groups,
            default_weight_decay=self.config.weight_decay,
            default_lr_scale=self.config.default_lr_scale,
            clip_norm=self.config.clip_norm,
        )

    # ---------------- steps ----------------

    def _make_train_step(self, params_example):
        opt = self._optimizer(params_example)
        cfg = self.config
        model = self.model
        augment = self.augment_fn

        def loss_fn(params, model_state, images, labels, rng):
            ctx = Ctx(train=True, rng=rng)
            logits, new_state = model.apply(params, model_state, images, ctx)
            loss = cross_entropy(logits, labels, cfg.label_smoothing)
            if cfg.regularizer is not None:
                loss = loss + cfg.regularizer(params)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, (new_state, acc)

        def train_step(params, model_state, opt_state, step, images, labels,
                       base_rng):
            # Derive the per-step rng ON DEVICE: an eager host-side fold_in
            # costs a full host↔device round trip per batch (~90 ms over the
            # axon tunnel) — 100× the step itself.
            rng = jax.random.fold_in(base_rng, step)
            if augment is not None:
                rng, arng = jax.random.split(rng)
                images = augment(arng, images)
            (loss, (new_state, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, model_state, images, labels, rng)
            updates, new_opt_state = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt_state, loss, acc

        # Donate params/model_state/opt_state: they're consumed and replaced
        # every step, so XLA can update in place (halves parameter HBM traffic).
        if self.mesh is not None:
            from ..parallel.mesh import dp_shardings

            batch_s, rep_s = dp_shardings(self.mesh)
            jitted = jax.jit(
                train_step,
                in_shardings=(rep_s, rep_s, rep_s, None, batch_s, batch_s, None),
                out_shardings=(rep_s, rep_s, rep_s, rep_s, rep_s),
                donate_argnums=(0, 1, 2),
            )
        else:
            jitted = jax.jit(train_step, donate_argnums=(0, 1, 2))
        jitted.raw = train_step  # unjitted body (bench wraps it in fori_loop)
        return jitted

    def _make_eval_step(self):
        model = self.model

        @jax.jit
        def eval_step(params, model_state, images, labels):
            logits, _ = model.apply(params, model_state, images,
                                    Ctx(train=False))
            pred = jnp.argmax(logits, -1)
            return jnp.sum((pred == labels).astype(jnp.int32)), pred

        return eval_step

    # ---------------- epoch drivers ----------------

    def train_epoch(self, state: TrainState, dataset, epoch: int, *,
                    verbose=True):
        """dataset: object with .train_batches(batch_size, seed) yielding
        (images, labels) numpy/jnp arrays of fixed shape."""
        cfg = self.config
        if self._train_step is None:
            self._train_step = self._make_train_step(state.params)
        t0 = time.time()
        base_rng = jax.random.PRNGKey(cfg.seed)
        losses, accs = [], []  # device scalars — fetched once at epoch end
        batch_kwargs = {"native": True} if cfg.native_loader else {}
        for bi, (images, labels) in enumerate(
                dataset.train_batches(cfg.batch_size, seed=cfg.seed + epoch,
                                      **batch_kwargs)):
            (state.params, state.model_state, state.opt_state, loss, acc) = \
                self._train_step(state.params, state.model_state,
                                 state.opt_state, state.step,
                                 images, labels, base_rng)
            state.step += 1
            losses.append(loss)
            accs.append(acc)
            if verbose and bi % cfg.log_every == 0:
                print(f"Epoch {epoch+1}, Batch {bi}, Loss: {float(loss):.4f}, "
                      f"Acc: {100.0*float(acc):.2f}%")
        jax.block_until_ready(state.params)
        dt = time.time() - t0
        batches = len(losses)
        avg_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        avg_acc = 100.0 * float(jnp.mean(jnp.stack(accs))) if accs else 0.0
        if verbose:
            print(f"Epoch {epoch+1} - Loss: {avg_loss:.4f}, "
                  f"Train Acc: {avg_acc:.2f}%, Time: {dt:.2f}s")
        return {"loss": avg_loss, "acc": avg_acc, "time": dt}

    def evaluate(self, state: TrainState, dataset, *, split="test"):
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        total = 0
        corrects, preds, labels_all = [], [], []  # device values, fetched once
        for images, labels in dataset.eval_batches(self.config.eval_bs,
                                                   split=split):
            c, pred = self._eval_step(state.params, state.model_state,
                                      jnp.asarray(images), jnp.asarray(labels))
            corrects.append(c)
            total += labels.shape[0]
            preds.append(pred)
            labels_all.append(np.asarray(labels))
        correct = int(np.sum(jax.device_get(corrects))) if corrects else 0
        preds = [np.asarray(p) for p in preds]
        acc = 100.0 * correct / max(total, 1)
        return {"acc": acc,
                "predictions": np.concatenate(preds) if preds else np.array([]),
                "labels": np.concatenate(labels_all) if labels_all else np.array([])}

    def fit(self, state: TrainState, dataset, *, verbose=True,
            checkpoint_dir=None, checkpoint_backend="pickle",
            param_stats_fn=None):
        """Full training run with eval cadence, best-acc tracking, early
        stopping and optional best-model checkpointing (the reference's only
        checkpoint: emotion_recognition.py:359-363)."""
        cfg = self.config
        best_acc, patience_count = 0.0, 0
        history = []
        for epoch in range(cfg.epochs):
            stats = self.train_epoch(state, dataset, epoch, verbose=verbose)
            if param_stats_fn is not None and verbose:
                param_stats_fn(state.params, epoch)
            if (epoch + 1) % cfg.eval_every == 0 or epoch == cfg.epochs - 1:
                ev = self.evaluate(state, dataset)
                stats["test_acc"] = ev["acc"]
                if verbose:
                    print(f"Epoch {epoch+1}: Test Acc: {ev['acc']:.2f}%")
                if ev["acc"] > best_acc:
                    best_acc = ev["acc"]
                    patience_count = 0
                    if checkpoint_dir is not None:
                        from .checkpoint import save_checkpoint
                        save_checkpoint(checkpoint_dir, state, tag="best",
                                        backend=checkpoint_backend)
                else:
                    patience_count += 1
                if (cfg.early_stop_patience is not None
                        and patience_count >= cfg.early_stop_patience):
                    if verbose:
                        print(f"Early stopping at epoch {epoch+1}")
                    history.append(stats)
                    break
            history.append(stats)
        return {"best_acc": best_acc, "history": history}


def pde_param_stats(params, prefix=""):
    """The per-epoch α/β statistics print (mnist_test.py:324-341).
    Matches any coefficient field path (diff.*, feature_extractor.pdeN.*,
    diffusionN.* — all model families); pass prefix to narrow."""
    out = {}
    for name, p in param_path_items(params):
        if prefix in name and ("alpha" in name or "beta" in name):
            arr = np.asarray(p)
            out[name] = {"mean": float(arr.mean()), "std": float(arr.std()),
                         "min": float(arr.min()), "max": float(arr.max())}
    return out
