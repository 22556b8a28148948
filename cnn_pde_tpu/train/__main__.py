"""Training CLI — the L5 driver replacing the reference's __main__ blocks.

    python -m cnn_pde_tpu.train --preset mnist [--synthetic] [--epochs N]
        [--steps N] [--data-dir ./data] [--checkpoint-dir ckpt] [--resume]

The reference has no flag/config system (SURVEY.md §5); this exposes every
preset with overridable epochs/batch size and synthetic-data mode for smoke
runs on machines without the real datasets.
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def main():
    ap = argparse.ArgumentParser(description="cnn_pde_tpu trainer")
    ap.add_argument("--preset", required=True)
    ap.add_argument("--synthetic", action="store_true",
                    help="force the synthetic fixture dataset")
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--grad-accum", type=int, default=1, metavar="K",
                    help="average gradients over K micro-batches per "
                         "optimizer update (effective batch = batch-size*K "
                         "without holding it in HBM; optax.MultiSteps)")
    ap.add_argument("--steps", type=int, default=None,
                    help="cap train steps per epoch (smoke runs)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-backend", default="pickle",
                    choices=["pickle", "orbax"])
    ap.add_argument("--init-from-torch", default=None, metavar="PTH",
                    help="warm-start from a PyTorch reference "
                         "model.state_dict() checkpoint "
                         "(compat.load_torch_checkpoint); fresh optimizer")
    ap.add_argument("--resume", action="store_true",
                    help="restore from checkpoint-dir ('last' if present, "
                         "else 'best') and continue from the first "
                         "uncompleted epoch")
    ap.add_argument("--async-checkpoint", action="store_true",
                    help="save best checkpoints off-thread (device fetch + "
                         "disk write overlap training)")
    ap.add_argument("--checkpoint-every", type=int, default=None,
                    help="also save a rolling 'last' checkpoint every N "
                         "epochs (fault tolerance; pairs with --resume)")
    ap.add_argument("--no-preemption-handler", action="store_true",
                    help="do NOT catch SIGTERM/SIGINT for a graceful "
                         "stop-checkpoint-exit at the next chunk boundary "
                         "(on by default: TPU maintenance/spot reclaims "
                         "send SIGTERM; pairs with --resume)")
    ap.add_argument("--metrics-out", default=None,
                    help="stream per-epoch metrics to this path "
                         "(.jsonl/.csv; a directory means TensorBoard)")
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax_debug_nans: re-run the offending op eagerly "
                         "and raise at the first NaN (slow; debugging only)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bn-refresh", type=int, default=0, metavar="K",
                    help="after training, recompute BatchNorm running stats "
                    "with K precise-BN passes under the final params "
                    "(Trainer.refresh_bn_stats) and re-evaluate — fixes the "
                    "stale-EMA eval collapse this architecture family is "
                    "exposed to (PARITY.md §bn-refresh); 66 passes leave "
                    "~1e-3 of the stale stats at torch momentum 0.1")
    ap.add_argument("--bf16-moments", action="store_true",
                    help="store Adam's m/v moments in bf16 (halves the "
                         "optimizer's streaming traffic: −7%% tiny / −19%% "
                         "hybrid step time; f32 compute, low-precision "
                         "state — PERF.md §bf16-moments)")
    ap.add_argument("--summary", action="store_true",
                    help="print the per-subtree parameter table "
                         "(utils.model_summary) before training")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all visible devices")
    ap.add_argument("--tp", type=int, default=1, metavar="N",
                    help="tensor-parallel the FC stacks over N devices "
                         "(Megatron column/row over the mesh's 'model' "
                         "axis); remaining devices form the 'data' axis, "
                         "so --tp composes with --dp")
    ap.add_argument("--spatial", type=int, default=1, metavar="N",
                    help="shard the PDE feature map's H axis over N devices "
                         "(ppermute halo exchange per stencil step — "
                         "parallel/spatial_model.py). Supported for the "
                         "presets with large maps: emotion (48x48 FTCS) and "
                         "tiny_imagenet (64x64 conv-Laplacian). Remaining "
                         "devices form the 'data' axis (composes with --dp); "
                         "params/checkpoints interchange with the unsharded "
                         "model")
    ap.add_argument("--native-loader", action="store_true",
                    help="use the C++ prefetching batcher")
    ap.add_argument("--device-epoch", action="store_true",
                    help="run each epoch as ONE jit dispatch (lax.scan over "
                         "all batches; dataset resident in HBM)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu). Note: the env var "
                         "JAX_PLATFORMS is overridden by preregistered PJRT "
                         "plugins; this flag applies jax.config.update before "
                         "any device use, which wins")
    ap.add_argument("--amp", action="store_true",
                    help="pde.enable_amp: bf16 hoisted-inverse ADI solves + "
                         "bf16-operand convs/Ruthotto matmuls — the TPU "
                         "analogue of the reference's AMP autocast training "
                         "(cifar10.py:440); half-precision numerics, "
                         "accuracy validated per preset, see PERF.md")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from ..data import build_augment_fn, load_dataset
    from ..models import MODEL_REGISTRY
    from ..train import Trainer, pde_param_stats
    from ..train.checkpoint import restore_state
    from ..utils.config import get_preset

    preset = get_preset(args.preset)
    print(f"Preset: {preset.name}  backend: {jax.default_backend()} "
          f"devices: {len(jax.devices())}")

    dataset = load_dataset(preset.dataset, args.data_dir,
                           synthetic_ok=True) if not args.synthetic else \
        load_dataset(preset.dataset, "/nonexistent", synthetic_ok=True)
    print(f"Dataset: {preset.dataset} ({dataset.source}), "
          f"train {dataset.train_images.shape}, test {dataset.test_images.shape}")

    epochs = args.epochs or preset.epochs
    batch_size = args.batch_size or preset.batch_size
    steps_per_epoch = dataset.steps_for_batch(batch_size)
    if args.steps:
        steps_per_epoch = min(steps_per_epoch, args.steps)

    mesh = None
    image_spec = None
    if args.dp or args.tp > 1 or args.spatial > 1:
        from ..parallel import make_mesh

        n_dev = len(jax.devices())
        if args.tp < 1 or args.spatial < 1 or \
                n_dev % (args.tp * args.spatial) != 0:
            raise SystemExit(
                f"--tp {args.tp} x --spatial {args.spatial} must be >=1 "
                f"and divide the visible device count ({n_dev})")
        mesh = make_mesh(spatial=args.spatial, model=args.tp)
        print(f"Mesh: data={mesh.shape['data']}"
              f" x spatial={mesh.shape['spatial']}"
              f" x model={mesh.shape['model']} ({mesh.devices.size} devices)")

    if args.spatial > 1:
        from jax.sharding import PartitionSpec as P

        from ..parallel import (SpatialFTCSClassifier,
                                SpatialTinyImageNetClassifier)

        if preset.model == "emotion":
            model = SpatialFTCSClassifier(
                mesh, num_classes=preset.num_classes,
                dropout_rate=preset.model_kwargs.get("dropout_rate", 0.3))
        elif preset.model == "tiny_imagenet":
            model = SpatialTinyImageNetClassifier(
                mesh,
                num_classes=preset.model_kwargs.get("num_classes", 200))
        else:
            raise SystemExit(
                "--spatial supports the large-map presets only "
                "(emotion, tiny_imagenet); the 28-32 px families have "
                "nothing to shard")
        image_spec = P("data", None, "spatial", None)
    else:
        model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    # the reference prints parameter totals + the PDE-group split at train
    # start (cifar10.py:413-420, SVHN.py:310, cifar_2version.py:480-481)
    from ..data import SYNTHETIC_SPECS
    from ..utils.summary import format_summary, model_summary

    _c, _s, _ = SYNTHETIC_SPECS[preset.dataset]
    summ = model_summary(model, (batch_size, _c, _s, _s))
    pct = (100.0 * summ["pde_params"] / summ["total_params"]
           if summ["total_params"] else 0.0)
    print(f"Model: {summ['total_params']:,} parameters "
          f"(PDE groups {summ['pde_params']:,} = {pct:.1f}%)")
    if args.summary:
        print(format_summary(summ))
    if args.amp:
        from ..nn.layers import Conv2d
        from ..pde import enable_amp
        from ..pde.amp import iter_modules
        from ..pde.ruthotto import SymmetricLayer

        n_amp = enable_amp(model)
        n_dense = len(list(iter_modules(model, (Conv2d, SymmetricLayer))))
        print(f"AMP: {n_amp} hoisted-bf16 ADI layers + {n_dense} bf16 dense "
              f"ops (conv/Ruthotto) + matinv_bf16 solves")
    # schedules advance per optimizer UPDATE: under --grad-accum K the
    # inner count steps once per K micro-batches, so the horizon is
    # updates-per-epoch (exactly as a real batch_size*K run would see)
    schedule = preset.make_schedule(
        max(1, steps_per_epoch // max(args.grad_accum, 1)))
    config = preset.make_train_config(epochs=epochs, batch_size=batch_size,
                                      seed=args.seed,
                                      native_loader=args.native_loader,
                                      device_epoch=args.device_epoch,
                                      grad_accum=args.grad_accum,
                                      moment_dtype=("bfloat16"
                                                    if args.bf16_moments
                                                    else None),
                                      max_steps_per_epoch=args.steps)
    augment_fn = build_augment_fn(preset.augment)
    trainer = Trainer(model, config, schedule, augment_fn=augment_fn,
                      mesh=mesh, tp=args.tp > 1, image_spec=image_spec)

    initial = None
    if args.init_from_torch:
        from ..compat import load_torch_checkpoint

        initial = load_torch_checkpoint(args.init_from_torch, args.preset)
        print(f"Warm-start: imported torch checkpoint "
              f"{args.init_from_torch}")
    state = trainer.init_state(jax.random.PRNGKey(args.seed), None,
                               initial=initial)
    if args.resume and args.checkpoint_dir:
        import os

        tag = "last" if (
            os.path.exists(os.path.join(args.checkpoint_dir, "last.ckpt"))
            or os.path.isdir(os.path.join(args.checkpoint_dir, "last.orbax"))
        ) else "best"
        state = restore_state(state, args.checkpoint_dir, tag=tag)
        print(f"Resumed from step {state.step} ({tag} checkpoint)")

    def stats_fn(params, epoch):
        stats = pde_param_stats(params)
        for name, s in list(stats.items())[:4]:
            print(f"  {name}: μ={s['mean']:.3f} σ={s['std']:.3f} "
                  f"range=[{s['min']:.3f}, {s['max']:.3f}]")

    sink = None
    if args.metrics_out:
        from .sinks import sink_from_path

        sink = sink_from_path(args.metrics_out)
    from .loop import GracefulPreemption

    t0 = time.time()
    preemption = (None if args.no_preemption_handler
                  else GracefulPreemption(verbose=not args.quiet))
    try:
        if preemption is not None:
            preemption.__enter__()
        result = trainer.fit(state, dataset, verbose=not args.quiet,
                             checkpoint_dir=args.checkpoint_dir,
                             checkpoint_backend=args.checkpoint_backend,
                             checkpoint_async=args.async_checkpoint,
                             checkpoint_every=args.checkpoint_every,
                             param_stats_fn=stats_fn, metrics_sink=sink,
                             preemption=preemption)
    finally:
        if preemption is not None:
            preemption.__exit__()
        if sink is not None:
            sink.close()
    out = {
        "preset": preset.name,
        "best_acc": result["best_acc"],
        "wall_s": round(time.time() - t0, 2),
        "epochs": len(result["history"]),
    }
    if args.bn_refresh and not result.get("preempted"):
        # Refresh the BEST model, not the last-epoch params: fit's best_acc
        # may come from an earlier epoch, and refreshing the final params
        # would make bn_refresh_acc incomparable to best_acc (and the
        # 'bn_refreshed' checkpoint silently worse than 'best').  Without a
        # checkpoint dir there is nothing to restore from — refresh the
        # final-epoch params and say so.
        refreshed_which = "final-epoch params"
        if args.checkpoint_dir:
            from .checkpoint import restore_state

            try:
                restore_state(state, args.checkpoint_dir, tag="best")
                refreshed_which = "best checkpoint"
            except (FileNotFoundError, OSError):
                pass  # no eval fired / no best saved: refresh final params
        trainer.refresh_bn_stats(state, dataset, batches=args.bn_refresh)
        refreshed = trainer.evaluate(state, dataset)["acc"]
        print(f"BN refresh ({args.bn_refresh} passes, {refreshed_which}): "
              f"test acc {refreshed:.2f}%")
        out["bn_refresh_acc"] = round(refreshed, 2)
        if args.checkpoint_dir:
            from .checkpoint import save_checkpoint

            save_checkpoint(args.checkpoint_dir, state, tag="bn_refreshed",
                            backend=args.checkpoint_backend)
    if result.get("preempted"):
        out["preempted"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
