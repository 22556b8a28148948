"""Train every preset on its synthetic fixture for a few epochs and tabulate
test accuracy — the end-to-end learning demonstration across all seven
flagship models (used to produce the table in PERF.md).

Usage: python tools/train_all_presets.py [--epochs 6] [--train-per-class 60]
"""

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--train-per-class", type=int, default=60)
    ap.add_argument("--test-per-class", type=int, default=20)
    ap.add_argument("--presets", nargs="*", default=None)
    ap.add_argument("--device-epoch", action="store_true",
                    help="one jit dispatch per epoch (TrainConfig.device_epoch)")
    ap.add_argument("--amp", action="store_true",
                    help="pde.enable_amp (bf16 hoisted-inverse solves + bf16 "
                         "convs/Ruthotto) — validates that AMP training "
                         "reaches f32-level accuracy on every preset")
    args = ap.parse_args()

    from cnn_pde_tpu.data import build_augment_fn, load_dataset
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import PRESETS, get_preset

    names = args.presets or list(PRESETS)
    results = {}
    for name in names:
        preset = get_preset(name)
        tpc = args.train_per_class
        if preset.dataset == "tiny_imagenet":
            tpc = min(tpc, 20)  # 200 classes — keep the fixture moderate
        ds = load_dataset(preset.dataset, "/nonexistent", synthetic_ok=True,
                          synthetic_train_per_class=tpc,
                          synthetic_test_per_class=args.test_per_class)
        model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
        if args.amp:
            from cnn_pde_tpu.pde import enable_amp

            enable_amp(model)
        bs = min(preset.batch_size, max(ds.train_images.shape[0] // 4, 8))
        trainer = Trainer(
            model,
            preset.make_train_config(epochs=args.epochs, batch_size=bs,
                                     log_every=10**9,
                                     device_epoch=args.device_epoch),
            preset.make_schedule(ds.steps_for_batch(bs)),
            augment_fn=build_augment_fn(preset.augment))
        state = trainer.init_state(jax.random.PRNGKey(0), None)
        t0 = time.time()
        accs = []
        for e in range(args.epochs):
            trainer.train_epoch(state, ds, e, verbose=False)
            accs.append(round(trainer.evaluate(state, ds)["acc"], 1))
        results[name] = {"acc_by_epoch": accs, "wall_s": round(time.time() - t0, 1),
                         "batch_size": bs}
        print(f"{name}: {accs} ({results[name]['wall_s']}s)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
