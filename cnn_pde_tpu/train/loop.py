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


class GracefulPreemption:
    """Latch SIGTERM/SIGINT into a flag so ``Trainer.fit(preemption=...)``
    can stop at the next chunk boundary, checkpoint, and return cleanly —
    the TPU-pod preemption story (maintenance events / spot reclaims send
    SIGTERM; the reference's loops would lose the run).  Paired with
    ``checkpoint_dir`` + ``--resume``, a preempted run restarts from the
    first uncompleted epoch with optimizer/schedule state intact.

    Context manager; restores the previous handlers on exit.  The second
    signal falls through to the previous handler (so a double Ctrl-C still
    kills a hung run).  Install from the main thread only (signal module
    rule); anywhere else, construct with ``signals=()`` and set
    ``.requested`` yourself.
    """

    def __init__(self, signals=None, verbose=True):
        import signal as _signal

        self.requested = False
        self.verbose = verbose
        self._signal = _signal
        self._signals = ((_signal.SIGTERM, _signal.SIGINT)
                         if signals is None else tuple(signals))
        self._previous = {}

    def _handle(self, signum, frame):
        if self.requested:  # second signal: defer to the original handler
            prev = self._previous.get(signum)
            if callable(prev):
                return prev(signum, frame)
            raise KeyboardInterrupt
        self.requested = True
        if self.verbose:
            print(f"[preemption] caught signal {signum}; finishing the "
                  "current chunk, then checkpointing and stopping",
                  flush=True)

    def __enter__(self):
        for s in self._signals:
            self._previous[s] = self._signal.signal(s, self._handle)
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            self._signal.signal(s, prev)
        self._previous.clear()
        return False

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
    # gradient accumulation: every k micro-batches are averaged into one
    # optimizer update (optax.MultiSteps) — the effective batch is
    # batch_size*k without holding it in HBM at once.  Schedules advance
    # per UPDATE (inner optimizer count), matching a real batch_size*k run;
    # clipping applies to the averaged gradient (same order as the
    # reference's clip-then-step).  k=1 (default) is a no-op.
    grad_accum: int = 1
    # Adam moment storage dtype: None = f32 (reference/torch semantics).
    # 'bfloat16' halves the optimizer's m/v streaming traffic — measured
    # −7% (tiny) / −19% (hybrid) full-step time (tools/ab_opt_bf16.py);
    # opt-in (--bf16-moments), accuracy validated on synthetic fixtures.
    moment_dtype: Optional[str] = None
    device_epoch: bool = False   # whole epoch in ONE jit dispatch (lax.scan)
    # with device_epoch, fit() fuses ALL epochs between eval points into one
    # dispatch (identical streams; pays the tunnel round trip per chunk
    # instead of per epoch).  Set False to dispatch per epoch.
    multi_epoch_dispatch: bool = True
    max_steps_per_epoch: Optional[int] = None  # cap (smoke runs; device_epoch)

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
                 augment_fn: Optional[Callable] = None, mesh=None, tp=False,
                 image_spec=None):
        """augment_fn(rng, images) -> images, applied on device inside the
        jit'd train step (train batches only).

        mesh: optional jax.sharding.Mesh with a 'data' axis — enables
        data-parallel training (batch sharded, params replicated, gradient
        all-reduce inserted by XLA).  The reference is single-device
        (SURVEY.md §2.6); this is the drop-in DP upgrade.

        tp: with a mesh whose 'model' axis is >1, additionally shard the FC
        stacks Megatron column/row-parallel over that axis
        (parallel/tensor_parallel.py::tp_param_specs); PDE coefficients and
        everything too small to split stay replicated.  Composes with DP on
        the same mesh (batch over 'data', FC weights over 'model').

        image_spec: optional PartitionSpec for IMAGE batches (labels always
        shard P('data')).  Default P('data') = pure batch sharding; pass
        P('data', None, 'spatial', None) when the model is a spatially
        sharded composition (parallel/spatial_model.py) so batches arrive
        already laid out for the shard_map evolution instead of being
        resharded at its boundary."""
        self.model = model
        self.config = config
        self.schedule = schedule
        self.augment_fn = augment_fn
        self.mesh = mesh
        self.tp = bool(tp)
        self.image_spec = image_spec
        self._train_step = None
        self._eval_step = None
        self._epoch_fn = None
        self._eval_epoch_fn = None
        self._base_rng = None
        self._warned_native = False
        self._dev_data = None  # (dataset, device train images/labels)
        self._dev_eval = {}    # split -> (dataset, n, padded images, labels)

    # ---------------- initialization ----------------

    def init_state(self, key, sample_batch, initial=None) -> TrainState:
        """``initial``: optional (params, model_state) to warm-start from —
        e.g. a reference torch checkpoint via compat.load_torch_checkpoint;
        must match the model's own init structure.  Optimizer state is
        freshly initialized either way (composes with the TP sharding
        path below)."""
        params, model_state = self.model.init(key)
        if initial is not None:
            init_p, init_ms = initial
            ts = jax.tree_util.tree_structure
            if ts(init_p) != ts(params) or ts(init_ms) != ts(model_state):
                raise ValueError(
                    "init_state(initial=...) trees do not match the "
                    "model's own init structure")
            params, model_state = init_p, init_ms
        opt = self._optimizer(params)
        if self.mesh is not None and self.tp:
            # Commit the TP layout up front; opt state init'd under jit
            # inherits the param shardings (moments shard with their params).
            from ..parallel.tensor_parallel import (replicated_like,
                                                    shard_pytree,
                                                    tp_param_specs)

            specs = tp_param_specs(params, self.mesh)
            params = shard_pytree(self.mesh, params, specs)
            model_state = replicated_like(self.mesh, model_state)
            opt_state = jax.jit(opt.init)(params)
        else:
            opt_state = opt.init(params)
        return TrainState(params, model_state, opt_state)

    def _param_sharding(self, params_example):
        """In/out sharding for the params argument: replicated under pure
        DP; the tp_param_specs pytree (FC stacks column/row over 'model')
        when tp=True."""
        from ..parallel.mesh import dp_shardings

        _, rep_s = dp_shardings(self.mesh)
        if not self.tp:
            return rep_s
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.tensor_parallel import tp_param_specs

        specs = tp_param_specs(params_example, self.mesh)
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, PartitionSpec))

    def _optimizer(self, params):
        md = self.config.moment_dtype
        opt = build_optimizer(
            params, self.schedule,
            groups=self.config.param_groups,
            default_weight_decay=self.config.weight_decay,
            default_lr_scale=self.config.default_lr_scale,
            clip_norm=self.config.clip_norm,
            moment_dtype=jnp.dtype(md) if md is not None else None,
        )
        k = int(self.config.grad_accum or 1)
        if k > 1:
            # accumulate the grad MEAN over k micro-batches, then apply the
            # whole chain (clip -> grouped AdamW) once — trajectory matches
            # a batch_size*k run (tested); schedules advance per update
            opt = optax.MultiSteps(opt, every_k_schedule=k)
        return opt

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
            from jax.sharding import NamedSharding

            from ..parallel.mesh import dp_shardings

            batch_s, rep_s = dp_shardings(self.mesh)
            img_s = (NamedSharding(self.mesh, self.image_spec)
                     if self.image_spec is not None else batch_s)
            param_s = self._param_sharding(params_example)
            # Under TP the opt state's sharding is whatever opt.init
            # inherited from the committed params (moments shard with their
            # params) — leave it unspecified so jit picks it up as-is.
            opt_s = None if self.tp else rep_s
            jitted = jax.jit(
                train_step,
                in_shardings=(param_s, rep_s, opt_s, None, img_s, batch_s,
                              None),
                out_shardings=(param_s, rep_s, opt_s, rep_s, rep_s),
                donate_argnums=(0, 1, 2),
            )
        else:
            jitted = jax.jit(train_step, donate_argnums=(0, 1, 2))
        jitted.raw = train_step  # unjitted body (bench wraps it in fori_loop)
        return jitted

    def _make_epoch_fn(self, params_example):
        """One jitted function running a FULL epoch as a lax.scan over batches.

        The host loop above dispatches once per batch; over a remote tunnel
        (or any dispatch-latency-bound host) that costs 2-8 ms per step —
        more than the 0.7-2.7 ms steps themselves (PERF.md).  Here the whole
        (in-HBM) train split stays resident and each scan step gathers its
        batch by permutation indices (batch-sized gather output — no second
        full-split copy in HBM).  Numerics match the host loop — same
        host-side permutation stream, same per-step rng fold_in on the same
        step numbers; parameters agree to float-reassociation level (~1e-6,
        tested), not bit-for-bit (XLA fuses the scan body differently from
        the standalone step).
        """
        if self._train_step is None:
            self._train_step = self._make_train_step(params_example)
        raw_step = self._train_step.raw
        mesh = self.mesh
        image_spec = self.image_spec

        def epoch_fn(params, model_state, opt_state, step0,
                     images_all, labels_all, idx, base_rng):
            # idx: (n_steps, batch) gather indices — one epoch's shuffled
            # batches, or SEVERAL epochs' concatenated (multi-epoch dispatch)

            def body(carry, bidx):
                p, m, o, step = carry
                bi = jnp.take(images_all, bidx, axis=0)
                bl = jnp.take(labels_all, bidx, axis=0)
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    spec = (image_spec if image_spec is not None
                            else P("data", *([None] * (bi.ndim - 1))))
                    bi = jax.lax.with_sharding_constraint(
                        bi, NamedSharding(mesh, spec))
                    bl = jax.lax.with_sharding_constraint(
                        bl, NamedSharding(mesh, P("data")))
                p, m, o, loss, acc = raw_step(p, m, o, step, bi, bl, base_rng)
                return (p, m, o, step + 1), (loss, acc)

            (params, model_state, opt_state, _), (losses, accs) = jax.lax.scan(
                body, (params, model_state, opt_state, step0), idx)
            # one (2, nb) array -> ONE host fetch per epoch instead of two
            return params, model_state, opt_state, jnp.stack([losses, accs])

        if mesh is not None:
            from ..parallel.mesh import dp_shardings

            _, rep_s = dp_shardings(self.mesh)
            param_s = self._param_sharding(params_example)
            opt_s = None if self.tp else rep_s
            return jax.jit(epoch_fn, donate_argnums=(0, 1, 2),
                           in_shardings=(param_s, rep_s, opt_s, None,
                                         rep_s, rep_s, rep_s, None),
                           out_shardings=(param_s, rep_s, opt_s, rep_s))
        return jax.jit(epoch_fn, donate_argnums=(0, 1, 2))

    def _device_train_arrays(self, dataset):
        """Cache the full train split in HBM once (raw [0,1] images — the
        normalize lives in the on-device augment fn, as in the host path)."""
        # key on the dataset OBJECT (strong ref — id() alone can be reused
        # for a new dataset allocated after the old one is collected)
        if self._dev_data is None or self._dev_data[0] is not dataset:
            images, labels = dataset.train_arrays()
            self._dev_data = (dataset, jnp.asarray(images),
                              jnp.asarray(labels))
        return self._dev_data[1], self._dev_data[2]

    def _epoch_indices(self, n, epoch):
        """One epoch's shuffled batch-index table (nb, batch) — the same
        permutation stream as ArrayDataset.train_batches(seed+epoch)."""
        cfg = self.config
        perm = np.random.default_rng(cfg.seed + epoch).permutation(n)
        if cfg.max_steps_per_epoch is not None:
            perm = perm[: cfg.max_steps_per_epoch * cfg.batch_size]
        nb = perm.shape[0] // cfg.batch_size
        return perm[: nb * cfg.batch_size].reshape(nb, cfg.batch_size)

    def _run_epochs_on_device(self, state: TrainState, dataset, epoch0: int,
                              n_epochs: int, *, verbose=True):
        """Run n_epochs WHOLE epochs in ONE jit dispatch (lax.scan over the
        concatenated shuffled batch tables) — identical streams to running
        them one dispatch per epoch, but the per-dispatch tunnel round trip
        (~4 s/epoch under pool congestion, PERF.md) is paid once per chunk.
        Returns per-epoch stats dicts (the 'time' entry is the chunk wall
        time divided evenly across the chunk's epochs — individual epochs
        inside one dispatch are not separately timed)."""
        cfg = self.config
        if cfg.native_loader and not self._warned_native:
            import warnings

            warnings.warn("device_epoch=True bypasses the native loader "
                          "(batching happens on device); native_loader "
                          "is ignored.")
            self._warned_native = True
        if self._epoch_fn is None:
            self._epoch_fn = self._make_epoch_fn(state.params)
        images_all, labels_all = self._device_train_arrays(dataset)
        n = images_all.shape[0]
        if n < cfg.batch_size:
            return [{"loss": 0.0, "acc": 0.0, "time": 0.0}
                    for _ in range(n_epochs)]
        t0 = time.time()
        idx_per_epoch = [self._epoch_indices(n, epoch0 + e)
                         for e in range(n_epochs)]
        nb = idx_per_epoch[0].shape[0]
        idx = np.concatenate(idx_per_epoch, axis=0)
        if self._base_rng is None:  # eager PRNGKey is a device dispatch
            self._base_rng = jax.random.PRNGKey(cfg.seed)
        (state.params, state.model_state, state.opt_state, stats) = \
            self._epoch_fn(state.params, state.model_state, state.opt_state,
                           jnp.asarray(state.step, jnp.int32),
                           images_all, labels_all, jnp.asarray(idx),
                           self._base_rng)
        losses, accs = np.asarray(stats)  # the chunk's ONE device->host fetch
        state.step += losses.shape[0]
        dt = time.time() - t0
        out = []
        for e in range(n_epochs):
            el, ea = losses[e * nb:(e + 1) * nb], accs[e * nb:(e + 1) * nb]
            if verbose:
                for bi in range(0, el.shape[0], cfg.log_every):
                    print(f"Epoch {epoch0+e+1}, Batch {bi}, "
                          f"Loss: {el[bi]:.4f}, Acc: {100.0*ea[bi]:.2f}%")
            avg_loss = float(el.mean()) if el.size else 0.0
            avg_acc = 100.0 * float(ea.mean()) if ea.size else 0.0
            if verbose:
                print(f"Epoch {epoch0+e+1} - Loss: {avg_loss:.4f}, "
                      f"Train Acc: {avg_acc:.2f}%, Time: {dt/n_epochs:.2f}s")
            # 'chunk' > 1 tells history consumers this epoch's 'time' is the
            # chunk wall time averaged over the fused epochs, not a per-epoch
            # measurement (and that param_stats_fn saw only chunk-end params)
            out.append({"loss": avg_loss, "acc": avg_acc,
                        "time": dt / n_epochs, "chunk": n_epochs})
        return out

    def _train_epoch_on_device(self, state: TrainState, dataset, epoch: int,
                               *, verbose=True):
        return self._run_epochs_on_device(state, dataset, epoch, 1,
                                          verbose=verbose)[0]

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
        if cfg.device_epoch and hasattr(dataset, "train_arrays"):
            return self._train_epoch_on_device(state, dataset, epoch,
                                               verbose=verbose)
        if self._train_step is None:
            self._train_step = self._make_train_step(state.params)
        t0 = time.time()
        base_rng = jax.random.PRNGKey(cfg.seed)
        losses, accs = [], []  # device scalars — fetched once at epoch end
        batch_kwargs = {"native": True} if cfg.native_loader else {}
        for bi, (images, labels) in enumerate(
                dataset.train_batches(cfg.batch_size, seed=cfg.seed + epoch,
                                      **batch_kwargs)):
            if (cfg.max_steps_per_epoch is not None
                    and bi >= cfg.max_steps_per_epoch):
                break
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
        return {"loss": avg_loss, "acc": avg_acc, "time": dt, "chunk": 1}

    def _evaluate_on_device(self, state: TrainState, dataset, *, split):
        """Whole eval split in one jit dispatch: pad to a batch multiple,
        scan batches, fetch only the predictions (padding sliced off on
        host).  One cache slot per split, replaced when the dataset object
        changes (no unbounded HBM pinning across datasets).

        HBM cost: the padded split stays device-resident for the Trainer's
        lifetime (replicated on every device under a DP mesh).  Fine for the
        preset-scale splits (CIFAR-10 test = 120 MB f32); for an oversized
        split prefer the per-batch host eval by constructing the Trainer
        with device_epoch=False."""
        cfg = self.config
        cached = self._dev_eval.get(split)
        if cached is None or cached[0] is not dataset:
            images, labels = dataset.eval_arrays(split)
            n = images.shape[0]
            bs = cfg.eval_bs
            nb = -(-n // bs)
            pad = nb * bs - n
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
            self._dev_eval[split] = (
                dataset,  # replaced (not accumulated) when the dataset changes
                n,
                jnp.asarray(images.reshape((nb, bs) + images.shape[1:])),
                np.ascontiguousarray(labels))  # host-side (never shipped)
        _, n, images, labels_np = self._dev_eval[split]

        if self._eval_epoch_fn is None:
            model = self.model
            mesh = self.mesh
            image_spec = self.image_spec

            def eval_epoch(params, model_state, images):
                def body(carry, imgs):
                    if mesh is not None:
                        from jax.sharding import (NamedSharding,
                                                  PartitionSpec as P)

                        spec = (image_spec if image_spec is not None else
                                P("data", *([None] * (imgs.ndim - 1))))
                        imgs = jax.lax.with_sharding_constraint(
                            imgs, NamedSharding(mesh, spec))
                    logits, _ = model.apply(params, model_state, imgs,
                                            Ctx(train=False))
                    return carry, jnp.argmax(logits, -1)

                return jax.lax.scan(body, 0, images)[1]

            if mesh is not None:
                from ..parallel.mesh import dp_shardings

                _, rep_s = dp_shardings(mesh)
                param_s = self._param_sharding(state.params)
                self._eval_epoch_fn = jax.jit(
                    eval_epoch, in_shardings=(param_s, rep_s, rep_s),
                    out_shardings=rep_s)
            else:
                self._eval_epoch_fn = jax.jit(eval_epoch)

        preds = self._eval_epoch_fn(state.params, state.model_state, images)
        preds = np.asarray(preds).reshape(-1)[:n]  # the ONE fetch
        # integer correct/total — matches the host eval path bit-for-bit
        correct = int(np.sum(preds == labels_np))
        return {"acc": 100.0 * correct / max(n, 1),
                "predictions": preds, "labels": labels_np}

    def evaluate(self, state: TrainState, dataset, *, split="test"):
        if self.config.device_epoch and hasattr(dataset, "eval_arrays"):
            return self._evaluate_on_device(state, dataset, split=split)
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

    def refresh_bn_stats(self, state: TrainState, dataset, *, batches=66,
                         batch_size=None, seed=0):
        """Precise-BN refresh: recompute BatchNorm running statistics under
        the FINAL (frozen) params, in ONE device dispatch.

        ``dataset`` is either a dataset object exposing
        ``eval_arrays(split="train")`` or a bare ``(images, labels)`` tuple
        of arrays; anything else raises TypeError.

        Why it exists: BN running stats are an exponential moving average
        accumulated ALONGSIDE the parameter trajectory, so they describe the
        activations of a mixture of recent past models, not the final one.
        On this architecture family the PDE front-end keeps reshaping the
        feature distribution late into training, and a handful of stale
        per-feature stats can tip eval-mode accuracy off a cliff while
        train-mode (batch-stat) accuracy sits at 100% — measured on the
        fashion preset (PARITY.md §bn-refresh: eval 30% vs train-mode 100%,
        stale features off by up to 9σ).  The torch reference has the same
        exposure (same EMA semantics) and no remedy.

        Mechanics: ``batches`` forward passes over shuffled train images in
        EVAL preprocessing (normalized, unaugmented) and eval stochastic
        behavior (dropout OFF) with only the normalization layers in
        batch-stat mode (``Ctx(bn_stats=True)``) — exactly the activations
        the eval-mode network sees.  Params are untouched; the EMA
        converges geometrically to the stationary stats of the final
        params ((1-m)^66 ≈ 1e-3 residual at torch momentum 0.1).  Updates
        ``state.model_state`` in place and returns the state.  Runs
        replicated (BN stats are O(features); no sharding needed).
        """
        cfg = self.config
        bs = batch_size or cfg.batch_size
        if hasattr(dataset, "eval_arrays"):
            images, _ = dataset.eval_arrays(split="train")
        else:
            try:
                images, _ = dataset
            except (TypeError, ValueError):
                raise TypeError(
                    "refresh_bn_stats expects a dataset exposing "
                    ".eval_arrays(split=...) or an (images, labels) tuple; "
                    f"got {type(dataset).__name__!r}") from None
        n = images.shape[0]
        bs = min(bs, n)
        rng = np.random.default_rng(seed)
        # K shuffled fixed-shape batches, cycling the split when it is small
        idx = np.concatenate([rng.permutation(n) for _ in
                              range(int(np.ceil(batches * bs / n)))])
        stack = jnp.asarray(
            images[idx[:batches * bs]].reshape((batches, bs) +
                                               images.shape[1:]))
        model = self.model

        @jax.jit
        def refresh(params, model_state, stack):
            def body(i, mstate):
                _, new_state = model.apply(params, mstate, stack[i],
                                           Ctx(bn_stats=True))
                return new_state

            return jax.lax.fori_loop(0, stack.shape[0], body, model_state)

        state.model_state = refresh(state.params, state.model_state, stack)
        return state

    def fit(self, state: TrainState, dataset, *, verbose=True,
            checkpoint_dir=None, checkpoint_backend="pickle",
            checkpoint_async=False, checkpoint_every=None,
            start_epoch=None, param_stats_fn=None, metrics_sink=None,
            preemption=None):
        """Full training run with eval cadence, best-acc tracking, early
        stopping and optional best-model checkpointing (the reference's only
        checkpoint: emotion_recognition.py:359-363).

        ``checkpoint_async=True`` saves best checkpoints off-thread
        (checkpoint.save_checkpoint_async): the device→host fetch and the
        disk write overlap the next training chunk instead of stalling it;
        fit() flushes every pending save before returning.

        Fault tolerance (beyond the reference): ``checkpoint_every=N``
        additionally saves a rolling 'last' checkpoint (params + BN stats +
        optimizer state + step) at every chunk boundary that crosses a
        multiple of N epochs, once more at the end, and on early stop; its
        ``extra`` dict carries best_acc/patience_count so a resumed run
        keeps best-model and early-stopping continuity.  ``start_epoch``
        resumes mid-run: None (default) derives it from ``state.step``
        (restored by checkpoint.restore_state) and the dataset's
        steps-per-epoch (capped by max_steps_per_epoch for --steps runs),
        so a killed run restarted with --resume continues from the first
        uncompleted epoch with schedule/optimizer state intact.

        ``metrics_sink`` (train.sinks.MetricsSink) receives each epoch
        record — the history dict plus a 1-based 'epoch' key, with
        'test_acc' already attached on eval epochs — flushed as soon as the
        epoch's numbers exist; the caller owns close().

        ``preemption``: an object with a ``requested`` attribute (usually a
        ``GracefulPreemption`` installed as a context manager).  When it
        turns True, fit stops at the next chunk boundary, saves the rolling
        'last' checkpoint (if ``checkpoint_dir`` is set — regardless of
        ``checkpoint_every``) and returns with ``"preempted": True``; a
        ``--resume`` restart continues from the first uncompleted epoch."""
        cfg = self.config
        best_acc, patience_count = 0.0, 0
        preempted = False
        history = []
        fuse = (cfg.device_epoch and cfg.multi_epoch_dispatch
                and hasattr(dataset, "train_arrays"))
        if start_epoch is None:
            spe = (dataset.steps_for_batch(cfg.batch_size)
                   if hasattr(dataset, "steps_for_batch") else None)
            if spe and cfg.max_steps_per_epoch is not None:
                # epochs advance by the capped step count (--steps runs)
                spe = min(spe, cfg.max_steps_per_epoch)
            start_epoch = min(int(state.step) // spe, cfg.epochs) \
                if spe else 0
        epoch = start_epoch
        if epoch and checkpoint_dir is not None:
            # resume continuity: the rolling 'last' checkpoint carries
            # best_acc / patience_count (its extra dict), so a restarted
            # run neither clobbers a better 'best' checkpoint with a worse
            # model nor resets the early-stopping clock
            from .checkpoint import load_checkpoint

            try:
                payload = load_checkpoint(checkpoint_dir, tag="last")
            except (FileNotFoundError, OSError):
                payload = None
            extra = (payload or {}).get("extra")
            if extra and payload.get("step") == int(state.step):
                best_acc = float(extra.get("best_acc", 0.0))
                patience_count = int(extra.get("patience_count", 0))
        if verbose and epoch:
            print(f"Resuming at epoch {epoch + 1}/{cfg.epochs} "
                  f"(step {int(state.step)}, best_acc {best_acc:.2f})")
        stop = False
        while epoch < cfg.epochs and not stop:
            # epochs until the next eval boundary (eval after epochs e with
            # (e+1) % eval_every == 0, and always after the last epoch)
            chunk = min(cfg.eval_every - epoch % cfg.eval_every,
                        cfg.epochs - epoch)
            if fuse:
                stats_list = self._run_epochs_on_device(
                    state, dataset, epoch, chunk, verbose=verbose)
                # per-epoch PDE parameter statistics: with fused chunks the
                # intermediate params don't exist on host — report chunk-end
                if param_stats_fn is not None and verbose:
                    param_stats_fn(state.params, epoch + chunk - 1)
            else:
                stats_list = []
                for e in range(epoch, epoch + chunk):
                    stats_list.append(
                        self.train_epoch(state, dataset, e, verbose=verbose))
                    if param_stats_fn is not None and verbose:
                        param_stats_fn(state.params, e)
            prev_epoch, epoch = epoch, epoch + chunk
            if epoch % cfg.eval_every == 0 or epoch == cfg.epochs:
                ev = self.evaluate(state, dataset)
                stats_list[-1]["test_acc"] = ev["acc"]
                if verbose:
                    print(f"Epoch {epoch}: Test Acc: {ev['acc']:.2f}%")
                if ev["acc"] > best_acc:
                    best_acc = ev["acc"]
                    patience_count = 0
                    if checkpoint_dir is not None:
                        from .checkpoint import (save_checkpoint,
                                                 save_checkpoint_async)
                        save = (save_checkpoint_async if checkpoint_async
                                else save_checkpoint)
                        save(checkpoint_dir, state, tag="best",
                             backend=checkpoint_backend)
                else:
                    patience_count += 1
                if (cfg.early_stop_patience is not None
                        and patience_count >= cfg.early_stop_patience):
                    if verbose:
                        print(f"Early stopping at epoch {epoch}")
                    stop = True
            if (preemption is not None
                    and getattr(preemption, "requested", False)):
                if verbose:
                    print(f"Preemption: stopping after epoch {epoch} "
                          f"({'checkpointing' if checkpoint_dir else 'no checkpoint dir'})")
                stop = preempted = True
            # rolling 'last' save AFTER eval so its extra dict carries the
            # post-eval best_acc/patience_count; also fires on early stop
            # (the state that triggered the stop must persist — the
            # docstring's 'once more at the end' guarantee)
            if checkpoint_dir is not None and (preempted or (
                    checkpoint_every and (
                        epoch // checkpoint_every
                        > prev_epoch // checkpoint_every
                        or epoch == cfg.epochs or stop))):
                from .checkpoint import (save_checkpoint,
                                         save_checkpoint_async)
                (save_checkpoint_async if checkpoint_async
                 else save_checkpoint)(
                    checkpoint_dir, state, tag="last",
                    backend=checkpoint_backend,
                    extra={"best_acc": best_acc,
                           "patience_count": patience_count,
                           "epoch": epoch})
            if metrics_sink is not None:
                for i, rec in enumerate(stats_list):
                    metrics_sink.log({"epoch": prev_epoch + i + 1, **rec})
            history.extend(stats_list)
        if checkpoint_async and checkpoint_dir is not None:
            from .checkpoint import wait_for_checkpoints
            wait_for_checkpoints()
        return {"best_acc": best_acc, "history": history,
                "preempted": preempted}


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
