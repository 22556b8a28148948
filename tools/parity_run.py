"""End-to-end accuracy parity: train the ACTUAL reference MNIST script's model
(torch CPU) and our mnist preset on the SAME synthetic dataset, same epochs,
and compare test accuracy.

Requires the /root/reference mount; writes results to stdout.  This is the
closest runnable analogue of "final test-accuracy parity within run-to-run
noise" (BASELINE.md) on a machine with no dataset egress.

Usage: python tools/parity_run.py [--epochs 5] [--train-per-class 40]
"""

import argparse
import contextlib
import importlib.util
import io
import json
import os
import sys
import time
import types

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_reference_mnist():
    for mod in ("torchvision", "matplotlib", "matplotlib.pyplot"):
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            if mod == "torchvision":
                m.datasets = types.ModuleType("d")
                m.transforms = types.ModuleType("t")
            if mod == "matplotlib":
                m.pyplot = types.ModuleType("p")
            sys.modules[mod] = m
    spec = importlib.util.spec_from_file_location(
        "ref_mnist", "/root/reference/mnist_test.py")
    mod = importlib.util.module_from_spec(spec)
    with contextlib.redirect_stdout(io.StringIO()):
        spec.loader.exec_module(mod)
    return mod


def train_reference(xs, ys, xt, yt, epochs, batch_size=128):
    import torch
    import torch.nn as nn

    ref = load_reference_mnist()
    with contextlib.redirect_stdout(io.StringIO()):
        model = ref.PDEClassifier(dx=1.0, dy=1.0)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=3)
    crit = nn.CrossEntropyLoss(label_smoothing=0.1)
    torch.manual_seed(0)
    n = xs.shape[0]
    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        perm = np.random.default_rng(epoch).permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i : i + batch_size]
            imgs = torch.from_numpy(xs[idx])
            labels = torch.from_numpy(ys[idx].astype(np.int64))
            opt.zero_grad()
            loss = crit(model(imgs), labels)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
            opt.step()
        sched.step()
    model.eval()
    with torch.no_grad():
        pred = model(torch.from_numpy(xt)).argmax(1).numpy()
    acc = 100.0 * (pred == yt).mean()
    return acc, time.time() - t0


def train_ours(xs, ys, xt, yt, epochs, batch_size=128):
    import jax

    from cnn_pde_tpu.data import ArrayDataset
    from cnn_pde_tpu.models import MNISTClassifier
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset("mnist")
    ds = ArrayDataset(xs, ys, xt, yt)
    model = MNISTClassifier()
    trainer = Trainer(
        model,
        preset.make_train_config(epochs=epochs, batch_size=batch_size,
                                 log_every=10**9),
        preset.make_schedule(ds.steps_for_batch(batch_size)))
    state = trainer.init_state(jax.random.PRNGKey(0), None)
    t0 = time.time()
    epoch_times = []
    for e in range(epochs):
        te = time.time()
        trainer.train_epoch(state, ds, e, verbose=False)
        epoch_times.append(time.time() - te)
    acc = trainer.evaluate(state, ds)["acc"]
    # first epoch carries the one-time jit compile; steady state excludes it
    steady = (sum(epoch_times[1:]) / max(len(epoch_times) - 1, 1)
              if len(epoch_times) > 1 else epoch_times[0])
    return acc, time.time() - t0, steady


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--train-per-class", type=int, default=40)
    ap.add_argument("--test-per-class", type=int, default=10)
    args = ap.parse_args()

    if not os.path.isdir("/root/reference"):
        print("reference mount absent; nothing to compare")
        return

    from cnn_pde_tpu.data import make_synthetic

    xs, ys, xt, yt = make_synthetic(
        "mnist", train_per_class=args.train_per_class,
        test_per_class=args.test_per_class)
    print(f"dataset: train {xs.shape}, test {xt.shape}")

    ours_acc, ours_t, ours_epoch = train_ours(xs, ys, xt, yt, args.epochs)
    ref_acc, ref_t = train_reference(xs, ys, xt, yt, args.epochs)
    ref_epoch = ref_t / args.epochs
    print(json.dumps({
        "epochs": args.epochs,
        "reference_acc": round(float(ref_acc), 2),
        "ours_acc": round(float(ours_acc), 2),
        "reference_epoch_s": round(ref_epoch, 3),
        "ours_epoch_s_steady": round(ours_epoch, 3),
        "epoch_speedup": round(ref_epoch / max(ours_epoch, 1e-9), 1),
        "ours_wall_s_incl_compile": round(ours_t, 1),
    }))


if __name__ == "__main__":
    main()
