"""Serving CLI — load a trained checkpoint and predict / export / bench.

    python -m cnn_pde_tpu.serve --preset mnist --checkpoint-dir ckpt \
        [--input batch.npy] [--export model.stablehlo] [--amp] [--dp]

The reference has no inference/serve path at all (SURVEY.md §3.5 — inference
exists only as in-loop eval); this is the production complement to the
training CLI:

* ``--input X.npy``    predict labels/probs for a saved batch (NCHW float32)
* ``--export P``       serialize the eval-mode forward to StableHLO bytes
                       (reloadable without the model-building code)
* ``--amp``            bf16 hoisted-inverse solves + frozen-params operator
                       caching (`cache_hoisted_operators`)
* ``--linearize``      compose each linear PDE layer's whole evolution into
                       ONE matmul (`linearize_pde_layers`) — the fastest
                       frozen-params serving configuration (PERF.md §serving)
* ``--dp``             shard the request batch over all visible devices
* ``--http PORT``      production HTTP endpoint (stdlib ThreadingHTTPServer):
                       POST /predict with a .npy or JSON batch, GET /healthz
* ``--microbatch N``   dynamic batching for --http: concurrent requests
                       coalesce into one device dispatch of up to N rows
                       (serve_batch.MicroBatcher; add ~--microbatch-wait-ms
                       latency, amortizes the per-dispatch fixed cost)
* no flags             smoke: predict on a random batch and print a summary
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser(description="cnn_pde_tpu serving")
    ap.add_argument("--preset", required=True)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="restore params/state from this dir (tag 'best'); "
                         "omit for a random-init smoke run")
    ap.add_argument("--tag", default="best")
    ap.add_argument("--torch-checkpoint", default=None, metavar="PTH",
                    help="serve weights from a PyTorch reference "
                         "model.state_dict() checkpoint "
                         "(compat.load_torch_checkpoint; e.g. the "
                         "reference's best_model.pth)")
    ap.add_argument("--input", default=None,
                    help=".npy batch (NCHW float32) to predict on")
    ap.add_argument("--output", default="labels",
                    choices=["labels", "probs", "logits"])
    ap.add_argument("--export", default=None,
                    help="write the eval-mode forward as StableHLO to PATH")
    ap.add_argument("--batch-size", type=int, default=8,
                    help="smoke/export batch size when no --input is given")
    ap.add_argument("--amp", action="store_true",
                    help="bf16 solves + frozen-params operator caching")
    ap.add_argument("--linearize", nargs="?", const="f32", default=None,
                    choices=["f32", "bf16", "int8", "auto"],
                    help="collapse each linear PDE layer's whole evolution "
                         "into one composed matmul (frozen-params serving; "
                         "serve.linearize_pde_layers), storing the matrices "
                         "at the given grade.  Measured decision table "
                         "(PERF.md §linearized-int8, "
                         "§serving-batch-frontier): 'auto' picks int8 for "
                         "serving batches >= 256 on large-D models (int8 "
                         "keeps climbing to the bs-1024 champion, 4.4M "
                         "img/s) and bf16 below that or for small-D "
                         "presets (mnist/fashion: all grades within "
                         "noise); 'bf16' halves matrix traffic at "
                         "AMP-grade numerics (best 64-255); 'int8' = W8A8 "
                         "quantization (quarter traffic, ~0.5%% relative "
                         "logit error, eval accuracy unchanged; -32%% at "
                         "bs 1); 'f32' (the bare-flag default) = exact "
                         "grade.  With --http --buckets, 'auto' grades "
                         "for the LARGEST bucket")
    ap.add_argument("--linearize-bf16", action="store_true",
                    help="deprecated alias for --linearize bf16")
    ap.add_argument("--linearize-int8", action="store_true",
                    help="deprecated alias for --linearize int8")
    ap.add_argument("--dp", action="store_true",
                    help="shard the batch over all visible devices")
    ap.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve over HTTP: POST /predict (.npy or JSON "
                         "batch), GET /healthz — blocks until Ctrl-C")
    ap.add_argument("--microbatch", type=int, default=0, metavar="N",
                    help="with --http: coalesce concurrent requests into "
                         "one device dispatch of up to N rows "
                         "(serve_batch.MicroBatcher)")
    ap.add_argument("--microbatch-wait-ms", type=float, default=2.0,
                    help="max added latency while waiting to coalesce")
    ap.add_argument("--microbatch-pipeline", type=int, default=2,
                    help="coalesced batches allowed in flight at once "
                         "(overlaps device round trips; 1 = serial)")
    ap.add_argument("--buckets", default=None, metavar="B1,B2,...",
                    help="pad request batches to these sizes so XLA "
                         "compiles a handful of shapes instead of one per "
                         "distinct client batch size (padded rows sliced "
                         "off; sizes above the largest run unpadded); "
                         "e.g. --buckets 1,8,32,64")
    ap.add_argument("--reload-watch", type=float, default=0.0,
                    metavar="SECS",
                    help="with --http: poll the weight source every SECS "
                         "and hot-swap on change (a training job writing "
                         "new best checkpoints is served automatically); "
                         "0 = off, reload stays available via POST /reload")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data import SYNTHETIC_SPECS
    from .models import MODEL_REGISTRY
    from .serve import (cache_hoisted_operators, export_model,
                        make_predict_fn)
    from .utils.config import get_preset

    preset = get_preset(args.preset)
    channels, size, classes = SYNTHETIC_SPECS[preset.dataset]
    model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    if args.amp:
        from .pde import enable_amp

        enable_amp(model)

    params, state = model.init(jax.random.PRNGKey(0))
    restored = False
    if args.torch_checkpoint:
        from .compat import load_torch_checkpoint

        params, state = load_torch_checkpoint(args.torch_checkpoint,
                                              args.preset)
        restored = True
    elif args.checkpoint_dir:
        from .train.checkpoint import load_checkpoint, restore_components

        payload = load_checkpoint(args.checkpoint_dir, tag=args.tag)
        out = restore_components(payload, {"params": params,
                                           "model_state": state})
        params, state = out["params"], out["model_state"]
        restored = True

    if args.input:
        images = jnp.asarray(np.load(args.input).astype(np.float32))
    else:
        images = jnp.asarray(np.random.default_rng(0).random(
            (args.batch_size, channels, size, size)).astype(np.float32))

    if args.amp:
        n_cached = cache_hoisted_operators(model, params, state, images)
    else:
        n_cached = 0
    buckets = (tuple(int(b) for b in args.buckets.split(","))
               if args.buckets else None)

    grade = args.linearize
    if args.linearize_int8:  # deprecated aliases (imply --linearize)
        grade = "int8"
    elif args.linearize_bf16:
        grade = "bf16"
    lin_dtype = {"f32": None, "bf16": jnp.bfloat16, "int8": jnp.int8,
                 "auto": "auto", None: None}[grade]
    if grade is not None:
        from .serve import linearize_pde_layers

        # 'auto' grades for the largest batch the server will actually run
        serve_bs = max(buckets) if buckets else int(images.shape[0])
        n_linearized = linearize_pde_layers(
            model, params, state, images, dtype=lin_dtype,
            serve_batch_size=serve_bs)
    else:
        n_linearized = 0

    mesh = None
    if args.dp:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(spatial=1)

    if args.export:
        export_model(model, params, state, images, args.export)

    predict = make_predict_fn(model, params, state, output=args.output,
                              mesh=mesh)

    if args.http is not None:
        from .serve_http import serve_http

        if buckets and mesh is not None:
            data = int(mesh.shape["data"])
            bad = [b for b in buckets if b % data]
            if bad:
                raise SystemExit(
                    f"--buckets {bad} not divisible by the 'data' axis "
                    f"size {data} (required for --dp batch sharding)")

        def build_fns(p, s):
            fns = {o: make_predict_fn(model, p, s, output=o, mesh=mesh,
                                      buckets=buckets)
                   for o in ("labels", "probs", "logits")}
            # warm every compile the server can hit before taking traffic
            warm_sizes = list(buckets) if buckets else [images.shape[0]]
            for fn in fns.values():
                for b in warm_sizes:
                    reps = -(-b // images.shape[0])  # ceil
                    fn(jnp.concatenate([images] * reps)[:b])
            return fns

        def reload_fns():
            """POST /reload: re-read the weights source, re-pin the frozen-
            params caches for the NEW weights, rebuild the served fns —
            args-bound weights hit the same compiled graphs (no recompile)."""
            from .serve import clear_linear_cache, clear_operator_cache

            if args.torch_checkpoint:
                from .compat import load_torch_checkpoint

                p, s = load_torch_checkpoint(args.torch_checkpoint,
                                             args.preset)
            elif args.checkpoint_dir:
                from .train.checkpoint import (load_checkpoint,
                                               restore_components)

                payload = load_checkpoint(args.checkpoint_dir, tag=args.tag)
                out = restore_components(payload, {"params": params,
                                                   "model_state": state})
                p, s = out["params"], out["model_state"]
            else:
                p, s = params, state  # smoke server: rebuild same weights
            clear_operator_cache(model)
            clear_linear_cache(model)
            if args.amp:
                cache_hoisted_operators(model, p, s, images)
            if grade is not None:
                from .serve import linearize_pde_layers

                linearize_pde_layers(
                    model, p, s, images, dtype=lin_dtype,
                    serve_batch_size=(max(buckets) if buckets
                                      else int(images.shape[0])))
            return build_fns(p, s)

        watch_paths = []
        if args.torch_checkpoint:
            watch_paths = [args.torch_checkpoint]
        elif args.checkpoint_dir:
            import os

            watch_paths = [
                os.path.join(args.checkpoint_dir, f"{args.tag}.ckpt"),
                os.path.join(args.checkpoint_dir, f"{args.tag}.orbax")]
        serve_http(build_fns(params, state), port=args.http,
                   default_output=args.output,
                   microbatch=args.microbatch,
                   microbatch_wait_ms=args.microbatch_wait_ms,
                   microbatch_pipeline=args.microbatch_pipeline,
                   reload_fn=reload_fns,
                   reload_watch_paths=(watch_paths if args.reload_watch > 0
                                       else None),
                   reload_watch_interval=args.reload_watch)
        return

    out = np.asarray(predict(images))

    summary = {
        "preset": preset.name,
        "restored": restored,
        "batch": int(images.shape[0]),
        "output": args.output,
        "amp_cached_layers": n_cached,
        "linearized_layers": n_linearized,
        "linearize_grade": grade,
        "devices": int(mesh.devices.size) if mesh is not None else 1,
    }
    if args.export:
        summary["exported"] = args.export
    if args.output == "labels":
        summary["predictions"] = out.tolist()
    else:
        summary["shape"] = list(out.shape)
        summary["argmax"] = out.argmax(-1).tolist()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
