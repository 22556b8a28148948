"""End-to-end accuracy parity, ALL seven families (T1-T7): train the ACTUAL
reference training setup (torch CPU — model ctor, optimizer/param groups,
scheduler, criterion, clip, regularizer from each reference train function)
and our preset on the SAME synthetic fixture, same hyperparameters, over
multiple seeds, and compare final test accuracy.

Reference provenance per family (hyperparameters lifted from the real code,
not re-derived): mnist_test.py:263-345, fashion_mnist.py:256-331,
SVHN.py:300-406, cifar10.py:400-527, cifar_2version.py:470-595,
emotion_recognition.py:198-369, tiny_imagenet.py:517-621.

Both sides consume the raw synthetic tensors (no augmentation on either
side — the comparison targets the training *function*'s optimization
dynamics, not the data pipeline, which has its own parity tests in
tests/test_augment_geometry.py / test_data.py).  Batches are seed-shuffled
with the remainder dropped on both sides; schedules use the same effective
T (cosine T_max / onecycle total_steps) on both sides.

Requires the /root/reference mount.  Emits one JSON line per family plus a
final markdown table (for PARITY.md) and a summary JSON.

Usage: python tools/parity_run.py [--families mnist svhn ...] [--seeds 8]
                                  [--epochs 5] [--train-per-class 40]
                                  [--match-init] [--bn-refresh 66]

With ``--bn-refresh K`` each training run is evaluated TWICE — once under
reference semantics (stale BN running-stat EMAs, exactly what the reference
publishes) and once after a symmetric precise-BN refresh on both sides — so
one torch-CPU training pass yields both the reference-semantics parity row
and the bn-refresh-controlled row (PARITY.md §bn-refresh).
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference"


# --------------------------------------------------------------------------
# reference loading (same stubbing approach as tests/test_reference_parity.py)

def load_ref(name):
    for mod in ("torchvision", "matplotlib", "matplotlib.pyplot", "kagglehub",
                "seaborn", "sklearn", "sklearn.metrics", "pandas"):
        if mod in sys.modules:
            continue
        try:
            importlib.import_module(mod)
            continue
        except ImportError:
            pass
        m = types.ModuleType(mod)
        if mod == "torchvision":
            m.datasets = types.ModuleType("d")
            m.transforms = types.ModuleType("t")
        if mod == "matplotlib":
            m.pyplot = types.ModuleType("p")
        if mod == "sklearn":
            m.metrics = types.ModuleType("m")
        if mod == "sklearn.metrics":
            m.classification_report = lambda *a, **k: ""
            m.confusion_matrix = lambda *a, **k: None
        sys.modules[mod] = m
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    with contextlib.redirect_stdout(io.StringIO()):
        spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------------
# family table: everything the reference train function pins

def _groups_alpha_beta(model, lr):
    """cifar10.py:423-434 — α/β at (lr, wd 1e-6); rest at (lr·0.5, wd 1e-4)."""
    pde, rest = [], []
    for name, p in model.named_parameters():
        (pde if ("alpha" in name or "beta" in name) else rest).append(p)
    return [{"params": pde, "lr": lr, "weight_decay": 1e-6},
            {"params": rest, "lr": lr * 0.5, "weight_decay": 1e-4}]


def _groups_hybrid(model, lr):
    """cifar_2version.py:483-499 — diffusion/mixing/combination at (lr, wd
    1e-6); rest at (lr·0.8, wd 1e-4)."""
    pde, rest = [], []
    for name, p in model.named_parameters():
        sel = ("alpha" in name or "beta" in name or "channel_mixing" in name
               or "combination_weights" in name)
        (pde if sel else rest).append(p)
    return [{"params": pde, "lr": lr, "weight_decay": 1e-6},
            {"params": rest, "lr": lr * 0.8, "weight_decay": 1e-4}]


FAMILIES = {
    # name: ref_file, build(ref)->model, preset, optimizer spec, schedule
    # spec, label smoothing, clip, batch size, regularizer(ref, model).
    # Optional statistical-power overrides (VERDICT r2 #3): `tpc_scale`
    # multiplies --train-per-class and `epochs` replaces --epochs for
    # families whose seed spread was too wide to falsify anything at the
    # default fixture size (fashion ±30, hybrid ±34 at tpc=40/epochs=5),
    # and `epochs` also CHEAPENS tiny_imagenet so its torch-CPU side can
    # afford n=8 seeds (at 5 epochs 8 seeds needed >4 h and timed out).
    "mnist": dict(
        ref_file="mnist_test", preset="mnist",
        build=lambda ref: ref.PDEClassifier(dx=1.0, dy=1.0),
        lr=1e-3, wd=1e-4, groups=None,
        sched=("cosine", dict(t_max=3)), smoothing=0.1, clip=1.0, batch=128,
        reg=None),
    "fashion_mnist": dict(
        ref_file="fashion_mnist", preset="fashion_mnist",
        build=lambda ref: ref.FashionPDEClassifier(),
        lr=2e-3, wd=5e-4, groups=None,
        sched=("cosine", dict(t_max=5)), smoothing=0.1, clip=1.0, batch=128,
        reg=None, tpc_scale=4, epochs=8),
    "svhn": dict(
        ref_file="SVHN", preset="svhn",
        build=lambda ref: ref.PDEClassifier(),
        lr=1e-2, wd=1e-4, groups=None,
        sched=("onecycle", dict(max_lr=1e-2, pct_start=0.3)),
        smoothing=0.0, clip=1.0, batch=256, reg=None),
    "cifar10_noconv": dict(
        ref_file="cifar10", preset="cifar10_noconv",
        build=lambda ref: ref.CIFAR10PDENoConv(dropout_rate=0.3),
        lr=1e-3, wd=None, groups=_groups_alpha_beta,
        sched=("cosine", dict(t_max=None)),  # T_max = epochs run
        smoothing=0.1, clip=1.0, batch=64, reg=None),
    "cifar10_hybrid": dict(
        ref_file="cifar_2version", preset="cifar10_hybrid",
        build=lambda ref: ref.CIFAR10HybridPDEModel(dropout_rate=0.4),
        lr=1e-3, wd=None, groups=_groups_hybrid,
        sched=("cosine", dict(t_max=None)),
        smoothing=0.1, clip=1.0, batch=64,
        reg=lambda ref, m: ref.hybrid_pde_regularization(
            m, alpha1=2e-4, alpha2=1e-4, alpha3=1e-6),
        tpc_scale=3, epochs=8),
    "emotion": dict(
        ref_file="emotion_recognition", preset="emotion",
        build=lambda ref: ref.DiffusionClassifier(img_size=48, num_classes=7,
                                                  dropout_rate=0.3),
        lr=1e-3, wd=1e-4, groups=None,
        sched=("cosine", dict(t_max=70, eta_min=1e-6)),
        smoothing=0.0, clip=None, batch=64, reg=None),  # no clip: :198-227
    "tiny_imagenet": dict(
        ref_file="tiny_imagenet", preset="tiny_imagenet",
        build=lambda ref: ref.ImprovedTinyImageNetClassifier(
            num_classes=200, use_pde=True),
        lr=1e-3, wd=1e-4, groups=None,
        sched=("onecycle", dict(max_lr=1e-2, pct_start=0.1)),
        smoothing=0.1, clip=1.0, batch=32, reg=None, epochs=3),
}


# --------------------------------------------------------------------------
# per-seed incremental bank (VERDICT r4 #2 / ADVICE r4): a family timeout
# must never again discard finished seeds.  Every completed seed appends one
# line to the bank the moment it finishes; a rerun with the same fixture
# skips banked seeds, so `timeout N tools/run_parity_tpu.sh` converges over
# repeated invocations instead of losing 20 minutes of work to rc=124.

def _git_short():
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10).stdout.strip() or None
    except Exception:
        return None


def _seed_key(rec):
    return (rec["side"], rec["family"], int(rec["seed"]), int(rec["epochs"]),
            int(rec["batch"]), int(rec["train_n"]), int(rec["test_n"]),
            bool(rec.get("match_init")), int(rec.get("bn_refresh") or 0),
            rec.get("platform"), rec.get("variant"))


def _seed_bank_load(path):
    bank = {}
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rec = json.loads(line)
                    bank[_seed_key(rec)] = rec
                except (json.JSONDecodeError, KeyError, ValueError):
                    continue
    return bank


def _seed_bank_append(path, rec):
    if not path:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()


def _bank_seed(bank, meta, side, seed, acc, acc_bn, wall_s):
    """Append one finished seed to the bank file and the in-memory map."""
    import datetime
    rec = dict(meta, side=side, seed=int(seed), acc=round(float(acc), 4),
               acc_bn=(round(float(acc_bn), 4) if acc_bn is not None
                       else None),
               wall_s=round(float(wall_s), 1),
               ts=datetime.datetime.now(datetime.timezone.utc).isoformat(
                   timespec="seconds"),
               git=_git_short())
    bank["rows"][_seed_key(rec)] = rec
    _seed_bank_append(bank["path"], rec)


def _banked_seed(bank, meta, side, seed, need_bn):
    """A banked record for this exact (side, seed, fixture), or None.  A
    record banked without the bn eval cannot serve a dual-eval run.

    The key deliberately has NO code-version dimension — banked rows are
    the measured, deterministic output of the revision in their ``git``
    field, and invalidating on every commit would defeat the resume
    purpose.  Reuse across revisions therefore WARNS when the banked git
    differs from HEAD: after a numerics-affecting change, pass
    --no-seed-bank (or delete the affected rows) to re-measure."""
    rec = bank["rows"].get(_seed_key(dict(meta, side=side, seed=seed)))
    if rec is not None and need_bn and rec.get("acc_bn") is None:
        return None
    if rec is not None:
        head = _git_short()
        if head and rec.get("git") and rec["git"] != head:
            print(f"  WARNING: {side} seed {seed} banked at git "
                  f"{rec['git']}, HEAD is {head} — if numerics changed "
                  "since, rerun with --no-seed-bank", flush=True)
    return rec


# --------------------------------------------------------------------------
# reference-side generic trainer

def train_reference(fam, xs, ys, xt, yt, epochs, bs, seeds, bn_refresh=0,
                    bank=None):
    """Returns (plain_accs, bn_accs_or_None, wall_s): each seed trains ONCE
    and is evaluated under reference semantics and (if bn_refresh) again
    after the precise-BN refresh — dual evaluation, single training cost.
    With ``bank``, finished seeds append incrementally and banked seeds are
    skipped (wall time then includes the banked seeds' recorded walls)."""
    ref = load_ref(fam["ref_file"])
    # the torch side is identical across our-side variants (e.g. the
    # ruthotto_f32 precision grade), so its bank key carries variant=None
    meta = dict(bank["meta"], platform="torch-cpu",
                match_init=True, variant=None) if bank else None
    accs, accs_bn, wall = [], [], 0.0
    for seed in range(seeds):
        rec = _banked_seed(bank, meta, "ref", seed,
                           bool(bn_refresh)) if bank else None
        if rec is not None:
            a, a_bn = rec["acc"], rec.get("acc_bn")
            wall += rec.get("wall_s", 0.0)
            print(f"  ref seed {seed}: banked ({a})", flush=True)
        else:
            t0 = time.time()
            a, a_bn = _train_reference_one(fam, ref, xs, ys, xt, yt, epochs,
                                           bs, seed, bn_refresh=bn_refresh)
            dt = time.time() - t0
            wall += dt
            if bank:
                _bank_seed(bank, meta, "ref", seed, a, a_bn, dt)
        accs.append(a)
        if a_bn is not None:
            accs_bn.append(a_bn)
    return accs, (accs_bn if bn_refresh else None), wall


def _torch_precise_bn(model, xs, bs, batches):
    """Precise-BN refresh for the torch side, mirroring
    ``Trainer.refresh_bn_stats`` exactly: ``batches`` shuffled fixed-shape
    train batches (rng seed 0, cycling the split) forwarded under the frozen
    final params with ONLY the BatchNorm layers in train mode (dropout off,
    no optimizer), so both sides' running-stat EMAs converge to the
    stationary stats of their final params before eval."""
    import torch
    import torch.nn as nn

    model.eval()
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d)):
            m.train()
    n = xs.shape[0]
    rng = np.random.default_rng(0)
    idx = np.concatenate([rng.permutation(n)
                          for _ in range(int(np.ceil(batches * bs / n)))])
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        for k in range(batches):
            b = idx[k * bs:(k + 1) * bs]
            model(torch.from_numpy(xs[b]))
    model.eval()


def _train_reference_one(fam, ref, xs, ys, xt, yt, epochs, bs, seed,
                         bn_refresh=0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    with contextlib.redirect_stdout(io.StringIO()):
        model = fam["build"](ref)
    if fam["groups"] is not None:
        opt = torch.optim.AdamW(fam["groups"](model, fam["lr"]))
    else:
        opt = torch.optim.AdamW(model.parameters(), lr=fam["lr"],
                                weight_decay=fam["wd"])
    n = xs.shape[0]
    spe = n // bs
    kind, kw = fam["sched"]
    if kind == "cosine":
        t_max = kw.get("t_max") or epochs
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=t_max, eta_min=kw.get("eta_min", 0.0))
        per_batch = False
    else:
        sched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=kw["max_lr"], total_steps=epochs * spe,
            pct_start=kw["pct_start"], anneal_strategy="cos")
        per_batch = True
    crit = nn.CrossEntropyLoss(label_smoothing=fam["smoothing"])

    for epoch in range(epochs):
        model.train()
        perm = np.random.default_rng(seed * 1009 + epoch).permutation(n)
        for i in range(0, spe * bs, bs):
            idx = perm[i:i + bs]
            imgs = torch.from_numpy(xs[idx])
            labels = torch.from_numpy(ys[idx].astype(np.int64))
            opt.zero_grad()
            with contextlib.redirect_stdout(io.StringIO()):
                loss = crit(model(imgs), labels)
            if fam["reg"] is not None:
                loss = loss + fam["reg"](ref, model)
            loss.backward()
            if fam["clip"] is not None:
                torch.nn.utils.clip_grad_norm_(model.parameters(),
                                               fam["clip"])
            opt.step()
            if per_batch:
                sched.step()
        if not per_batch:
            sched.step()
    acc_plain = _torch_eval(model, xt, yt)
    acc_bn = None
    if bn_refresh:
        _torch_precise_bn(model, xs, bs, bn_refresh)
        acc_bn = _torch_eval(model, xt, yt)
    return acc_plain, acc_bn


def _torch_eval(model, xt, yt):
    import torch

    model.eval()
    preds = []
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        for i in range(0, xt.shape[0], 256):
            preds.append(model(torch.from_numpy(xt[i:i + 256])
                               ).argmax(1).numpy())
    return float(100.0 * (np.concatenate(preds) == yt).mean())


# --------------------------------------------------------------------------
# our-side generic trainer

_REF_MODULES = {}


def _torch_seed_init(fam, seed):
    """(params, state) imported from the ACTUAL torch model built under
    ``torch.manual_seed(seed)`` — byte-identical to the init the reference
    side of this same seed trains from (``_train_reference_one``).  Used by
    --match-init to turn the accuracy comparison into a PAIRED design: same
    init AND same per-epoch shuffle stream on both sides, so the per-seed
    delta cancels seed-level init/data luck and only the training-dynamics
    difference (dropout streams, fp reduction order) remains."""
    import torch

    from cnn_pde_tpu.compat import import_state_dict

    if fam["ref_file"] not in _REF_MODULES:
        _REF_MODULES[fam["ref_file"]] = load_ref(fam["ref_file"])
    ref = _REF_MODULES[fam["ref_file"]]
    torch.manual_seed(seed)
    with contextlib.redirect_stdout(io.StringIO()):
        model = fam["build"](ref)
    return import_state_dict(model.state_dict(), fam["preset"])


def train_ours(fam, xs, ys, xt, yt, epochs, bs, seeds, match_init=False,
               bn_refresh=0, bank=None):
    import jax

    from cnn_pde_tpu.data import ArrayDataset
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.train import Trainer, schedules
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset(fam["preset"])
    ds = ArrayDataset(xs, ys, xt, yt,
                      num_classes=int(ys.max()) + 1)
    model_kwargs = dict(preset.model_kwargs)
    if fam.get("ruthotto_f32"):
        # exact-grade SymmetricLayers for the precision-matched comparison:
        # the torch baseline's autocast('cuda') is a no-op on CPU, so the
        # reference side trains f32 — the bf16 default is the AMP grade
        # (PARITY.md §hybrid-amp-grade)
        import jax.numpy as jnp
        model_kwargs["ruthotto_dtype"] = jnp.float32
    model = MODEL_REGISTRY[preset.model](**model_kwargs)
    spe = ds.steps_for_batch(bs)
    kind, kw = fam["sched"]
    if kind == "cosine":
        schedule = schedules.cosine_annealing(
            fam["lr"], kw.get("t_max") or epochs, spe,
            kw.get("eta_min", 0.0))
    else:
        schedule = schedules.onecycle(kw["max_lr"], total_steps=epochs * spe,
                                      pct_start=kw["pct_start"])
    config = preset.make_train_config(
        epochs=epochs, batch_size=bs, log_every=10**9,
        clip_norm=fam["clip"], device_epoch=True)
    trainer = Trainer(model, config, schedule)  # no augmentation: see module
    meta = dict(bank["meta"], platform=jax.default_backend(),
                match_init=bool(match_init),
                variant=("ruthotto_f32" if fam.get("ruthotto_f32")
                         else None)) if bank else None
    t0 = time.time()
    wall = 0.0
    accs, accs_bn = [], []
    for seed in range(seeds):  # one Trainer: the jit'd epoch is reused
        rec = _banked_seed(bank, meta, "ours", seed,
                           bool(bn_refresh)) if bank else None
        if rec is not None:
            accs.append(rec["acc"])
            if bn_refresh:
                accs_bn.append(rec["acc_bn"])
            wall += rec.get("wall_s", 0.0)
            print(f"  ours seed {seed}: banked ({rec['acc']})", flush=True)
            continue
        ts = time.time()
        # vary the FULL stream per seed — init AND batch order AND dropout
        # rng (cfg.seed drives the shuffle/rng streams); otherwise all seeds
        # share one chaotic trajectory and the spread is meaningless.
        # seed*1009 keeps the per-epoch shuffle streams (default_rng(
        # cfg.seed + epoch)) DISJOINT across seeds, mirroring the torch
        # side's seed*1009+epoch — seed+epoch alone would make seed 1's
        # epoch-0 permutation reuse seed 0's epoch-1 permutation
        trainer.config.seed = seed * 1009
        trainer._base_rng = None
        initial = _torch_seed_init(fam, seed) if match_init else None
        state = trainer.init_state(jax.random.PRNGKey(seed), None,
                                   initial=initial)
        for e in range(epochs):
            trainer.train_epoch(state, ds, e, verbose=False)
        # dual evaluation: reference-semantics accuracy FIRST (stale EMAs),
        # then the precise-BN refresh (mutates state.model_state) and the
        # controlled accuracy — one training run feeds both parity tables
        accs.append(float(trainer.evaluate(state, ds)["acc"]))
        if bn_refresh:
            trainer.refresh_bn_stats(state, ds, batches=bn_refresh,
                                     batch_size=bs)
            accs_bn.append(float(trainer.evaluate(state, ds)["acc"]))
        dt = time.time() - ts
        wall += dt
        if bank:
            _bank_seed(bank, meta, "ours", seed, accs[-1],
                       accs_bn[-1] if bn_refresh else None, dt)
    # per-seed walls sum to the family wall (banked seeds contribute their
    # recorded walls); the unbanked path keeps the original whole-loop wall
    if not bank:
        wall = time.time() - t0
    return accs, (accs_bn if bn_refresh else None), wall


# --------------------------------------------------------------------------
# family-level ref-accs cache (--ref-accs-from)

def load_ref_cache(path):
    """{(family, bn_refresh): [row, ...]} in file order, from raw row lines
    (our stdout/logs) AND perf_record envelopes (perf/parity.jsonl:
    {ts,...,argv,results:{key:row}}).

    Provenance rule: rows whose ref accs were themselves pulled from a
    cache are derivative and must never shadow the original torch-trained
    row (ADVICE r4).  Rows written since round 5 carry an explicit
    ``ref_provenance`` field ('trained' | 'cached') and are filtered on
    it — a run that was OFFERED a cache but fixture-missed and actually
    trained stays usable.  Older envelope rows without the field fall back
    to the conservative argv heuristic (skip if the producing run passed
    --ref-accs-from); their seeds remain reusable through the per-seed
    bank either way."""
    ref_cache = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(r.get("results"), dict):
                cands = list(r["results"].values())
                if any(isinstance(c, dict) and "ref_provenance" in c
                       for c in cands):
                    cands = [c for c in cands
                             if c.get("ref_provenance") == "trained"]
                elif any("--ref-accs-from" in str(a)
                         for a in (r.get("argv") or [])):
                    continue
            else:
                cands = [r]
            for c in cands:
                if isinstance(c, dict) and "family" in c \
                        and "ref_accs" in c:
                    ref_cache.setdefault(
                        (c["family"], c.get("bn_refresh") or 0),
                        []).append(c)
    return ref_cache


def pick_cached_row(ref_cache, key, cache_ok, match_init):
    """First row (file order) passing the fixture check — the original
    torch-trained record, never a later shadow; under --match-init only
    match_init rows qualify (ADVICE r4)."""
    for c in ref_cache.get(key, []):
        if cache_ok(c) and (not match_init or c.get("match_init")):
            return c
    return None


# --------------------------------------------------------------------------

def build_row(name, epochs, bs, n, test_n, seeds, ref_accs, ours_accs,
              ref_t, ours_t, match_init, bn_refresh, quantum):
    """All parity statistics for one (family, bn-mode) pair: Welch two-sample
    test on the seed means plus, under --match-init, the paired per-seed
    deltas and paired t-test (seed s shares its torch init and shuffle
    stream across sides)."""
    delta = float(np.mean(ours_accs) - np.mean(ref_accs))
    spread = float(max(np.ptp(ref_accs), np.ptp(ours_accs)))
    sa, sb = np.var(ref_accs, ddof=1), np.var(ours_accs, ddof=1)
    na, nb = len(ref_accs), len(ours_accs)
    se = float(np.sqrt(sa / na + sb / nb))
    if se > 0:
        t_stat = delta / se
        df = (sa / na + sb / nb) ** 2 / (
            (sa / na) ** 2 / (na - 1) + (sb / nb) ** 2 / (nb - 1))
        try:
            from scipy.stats import t as _t
            p_welch = float(2 * _t.sf(abs(t_stat), df))
        except ImportError:  # normal approximation fallback
            from math import erfc, sqrt
            p_welch = float(erfc(abs(t_stat) / sqrt(2)))
    else:
        t_stat, p_welch = 0.0, 1.0
    paired = {}
    if match_init:
        # paired per-seed deltas: seed s shares its torch init AND its
        # per-epoch shuffle stream across sides, so d_s cancels
        # init/data luck; a paired t-test on d is the right comparison
        d = np.asarray(ours_accs) - np.asarray(ref_accs)
        d_sem = float(np.std(d, ddof=1) / np.sqrt(len(d)))
        if d_sem > 0:
            t_p = float(np.mean(d)) / d_sem
            try:
                from scipy.stats import t as _t2
                p_paired = float(2 * _t2.sf(abs(t_p), len(d) - 1))
            except ImportError:
                from math import erfc, sqrt
                p_paired = float(erfc(abs(t_p) / sqrt(2)))
        else:
            p_paired = 1.0
        paired = {
            "match_init": True,
            "d_seeds": [round(float(x), 2) for x in d],
            "d_mean": round(float(np.mean(d)), 2),
            "d_sem": round(d_sem, 2),
            "p_paired": round(p_paired, 4),
            "equal_paired_at_0.05": bool(p_paired >= 0.05),
        }
    return {
        "family": name, "epochs": epochs, "batch": bs,
        "train_n": n, "test_n": test_n, "seeds": seeds,
        **({"bn_refresh": bn_refresh} if bn_refresh else {}),
        "ref_accs": [round(a, 2) for a in ref_accs],
        "ours_accs": [round(a, 2) for a in ours_accs],
        "ref_mean": round(float(np.mean(ref_accs)), 2),
        "ref_sem": round(float(np.sqrt(sa / na)), 2),
        "ours_mean": round(float(np.mean(ours_accs)), 2),
        "ours_sem": round(float(np.sqrt(sb / nb)), 2),
        "delta": round(delta, 2),
        "seed_spread": round(spread, 2),
        "within_spread": bool(abs(delta) <= max(spread, quantum)),
        "t_welch": round(float(t_stat), 3),
        "p_welch": round(p_welch, 4),
        "equal_at_0.05": bool(p_welch >= 0.05),
        "ref_wall_s": round(ref_t, 1), "ours_wall_s": round(ours_t, 1),
        **paired,
    }


def _record_row(row):
    """Durable per-seed record (perf/parity.jsonl) so the PARITY.md table's
    statistics are recomputable without rerunning hours of torch-CPU
    training.  Wall times are renamed so the drift checker ("_s" =
    lower-better) never flags load-dependent torch wall time as a perf
    regression."""
    from perf_record import record
    rec = {("ref_wall" if k == "ref_wall_s" else
            "ours_wall" if k == "ours_wall_s" else k): v
           for k, v in row.items()}
    key = row["family"] + (f"+bn{row['bn_refresh']}"
                           if row.get("bn_refresh") else "")
    if row.get("variant"):
        key += f"+{row['variant']}"
    record("parity", {key: rec})


def _print_tables(rows, label):
    if not rows:
        return {}
    print(f"\n[{label}] | family | ref acc (mean ± SEM) | ours (mean ± SEM) "
          "| Δ | Welch p | equal at 0.05 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['family']} | {r['ref_mean']} ± {r['ref_sem']} "
              f"(n={r['seeds']}) | {r['ours_mean']} ± {r['ours_sem']} | "
              f"{r['delta']:+.2f} | {r['p_welch']} | "
              f"{'yes' if r['equal_at_0.05'] else 'NO'} |")
    print()
    summary = {f"all_within_spread_{label}":
               all(r["within_spread"] for r in rows),
               f"all_equal_at_0.05_{label}":
               all(r["equal_at_0.05"] for r in rows)}
    if any("p_paired" in r for r in rows):
        print(f"[{label}] | family | paired Δ (mean ± SEM) | paired p "
              "| equal |")
        print("|---|---|---|---|")
        for r in rows:
            if "p_paired" in r:
                print(f"| {r['family']} | {r['d_mean']:+.2f} ± {r['d_sem']} "
                      f"| {r['p_paired']} | "
                      f"{'yes' if r['equal_paired_at_0.05'] else 'NO'} |")
        print()
        summary[f"all_equal_paired_at_0.05_{label}"] = all(
            r["equal_paired_at_0.05"] for r in rows if "p_paired" in r)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=list(FAMILIES))
    ap.add_argument("--seeds", type=int, default=8,
                    help="seeds per side — the default matches the "
                    "PARITY.md protocol (8), so a rerun with defaults "
                    "reproduces the documented table shape; tiny_imagenet "
                    "is affordable at n=8 only because its per-family "
                    "epochs override cheapens BOTH sides to 3 epochs")
    ap.add_argument("--epochs", type=int, default=5,
                    help="epochs per seed (per-family `epochs` overrides "
                    "take precedence: fashion/hybrid train longer for "
                    "statistical power, tiny shorter for torch-CPU cost)")
    ap.add_argument("--train-per-class", type=int, default=40)
    ap.add_argument("--test-per-class", type=int, default=10)
    ap.add_argument("--platform", default=None,
                    help="force the jax platform for OUR side (e.g. 'cpu' "
                    "when the TPU tunnel is down; accuracy is platform-"
                    "independent). Must be set before first jax use.")
    ap.add_argument("--ours-only", action="store_true",
                    help="skip the torch reference side (spot-check our "
                         "accuracies alone; no parity verdict)")
    ap.add_argument("--match-init", action="store_true",
                    help="PAIRED design: our side initializes each seed "
                    "from the ACTUAL torch seed-init (compat."
                    "import_state_dict), so per-seed deltas cancel init "
                    "luck; adds d_mean/d_sem/p_paired to each row")
    ap.add_argument("--bn-refresh", type=int, default=0, metavar="K",
                    help="DUAL evaluation: each trained model is scored "
                    "under reference semantics AND again after a precise-BN "
                    "refresh on BOTH sides (K forward passes under the "
                    "frozen final params with only the BatchNorm layers in "
                    "batch-stat mode — ours: Trainer.refresh_bn_stats; "
                    "torch: the mirrored _torch_precise_bn), emitting two "
                    "rows per family from ONE training run. The refreshed "
                    "row removes the BN running-stats eval-collapse luck "
                    "(PARITY.md §bn-refresh), isolating the training "
                    "dynamics. 66 leaves ~1e-3 of the stale EMA at torch "
                    "momentum 0.1.")
    ap.add_argument("--ref-accs-from", default=None,
                    help="JSONL file of earlier parity rows; when a family's "
                    "row matches this run's fixture (epochs/batch/train_n/"
                    "test_n) and covers >= --seeds seeds, reuse its ref_accs "
                    "instead of re-training the torch side (hours of CPU). "
                    "Only rows whose ref side was actually TRAINED qualify "
                    "(ref_provenance field; argv heuristic for older rows "
                    "— ADVICE r4), and under --match-init only match_init "
                    "rows are accepted (the torch side would be identical "
                    "either way, but unpaired-era rows predate the current "
                    "fixture discipline; the per-seed bank still reuses "
                    "their seeds if keys match).")
    ap.add_argument("--seed-bank", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "perf", "parity_seeds.jsonl"),
        help="per-seed incremental bank (VERDICT r4 #2): every finished "
        "seed appends one line the moment it completes, and reruns with "
        "the same fixture skip banked seeds — a family timeout preserves "
        "partial evidence instead of discarding all seeds")
    ap.add_argument("--no-seed-bank", action="store_true",
                    help="disable the per-seed bank (fresh seeds, no reuse) "
                    "— REQUIRED after a numerics-affecting code change, "
                    "since bank keys deliberately carry no code version "
                    "(reuse across revisions warns but proceeds)")
    ap.add_argument("--no-record", action="store_true",
                    help="do not append family rows to perf/parity.jsonl "
                    "(smoke/dev runs; pair with --seed-bank <tmpfile>)")
    ap.add_argument("--hybrid-f32", action="store_true",
                    help="exact-grade (f32) SymmetricLayer matmuls for the "
                    "cifar10_hybrid family instead of the production bf16 "
                    "AMP grade — the precision-MATCHED comparison against "
                    "the torch-CPU baseline, whose autocast('cuda') is a "
                    "no-op on CPU (PARITY.md §hybrid-amp-grade); rows are "
                    "keyed variant=ruthotto_f32 in both banks")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if not os.path.isdir(REF):
        print("reference mount absent; nothing to compare")
        return

    from cnn_pde_tpu.data import make_synthetic
    from cnn_pde_tpu.utils.config import get_preset

    ref_cache = load_ref_cache(args.ref_accs_from) \
        if args.ref_accs_from else {}

    rows, rows_bn = [], []
    for name in args.families:
        fam = FAMILIES[name]
        if args.hybrid_f32 and name == "cifar10_hybrid":
            fam = dict(fam, ruthotto_f32=True)
        preset = get_preset(fam["preset"])
        tpc, spc = args.train_per_class, args.test_per_class
        tpc *= fam.get("tpc_scale", 1)
        epochs = fam.get("epochs", args.epochs)
        if preset.dataset == "tiny_imagenet":
            tpc, spc = min(tpc, 4), min(spc, 2)  # 200 classes
        xs, ys, xt, yt = make_synthetic(preset.dataset, train_per_class=tpc,
                                        test_per_class=spc)
        n = xs.shape[0]
        bs = min(fam["batch"], max(n // 4, 8))
        bank = None
        if not args.no_seed_bank:
            bank = {"path": args.seed_bank,
                    "rows": _seed_bank_load(args.seed_bank),
                    "meta": {"family": name, "epochs": epochs, "batch": bs,
                             "train_n": n, "test_n": int(xt.shape[0]),
                             "bn_refresh": int(args.bn_refresh)}}
        ours_accs, ours_bn, ours_t = train_ours(
            fam, xs, ys, xt, yt, epochs, bs, args.seeds,
            match_init=args.match_init, bn_refresh=args.bn_refresh,
            bank=bank)
        if args.ours_only:
            out = {"family": name,
                   "ours_accs": [round(a, 2) for a in ours_accs],
                   "ours_mean": round(float(np.mean(ours_accs)), 2),
                   "ours_wall_s": round(ours_t, 1)}
            if ours_bn:
                out["ours_accs_bn"] = [round(a, 2) for a in ours_bn]
                out["ours_mean_bn"] = round(float(np.mean(ours_bn)), 2)
            print(json.dumps(out), flush=True)
            continue

        def _cache_ok(c):
            return (c is not None
                    and c.get("epochs") == epochs
                    and c.get("batch") == bs
                    and c.get("train_n") == n
                    and c.get("test_n") == int(xt.shape[0])
                    and len(c.get("ref_accs", [])) >= args.seeds)

        c0 = pick_cached_row(ref_cache, (name, 0), _cache_ok,
                             args.match_init)
        cb = (pick_cached_row(ref_cache, (name, args.bn_refresh), _cache_ok,
                              args.match_init) if args.bn_refresh else None)
        if c0 is not None and (not args.bn_refresh or cb is not None):
            # seeds are range(seeds) on both sides, so a prefix is valid
            ref_accs = c0["ref_accs"][:args.seeds]
            ref_bn = cb["ref_accs"][:args.seeds] if args.bn_refresh else None
            ref_t = c0.get("ref_wall_s", c0.get("ref_wall", 0.0))
            ref_prov = "cached"
            print(f"{name}: reusing ref_accs from {args.ref_accs_from} "
                  f"(fixture match)", flush=True)
        else:
            ref_accs, ref_bn, ref_t = train_reference(
                fam, xs, ys, xt, yt, epochs, bs, args.seeds,
                bn_refresh=args.bn_refresh, bank=bank)
            ref_prov = "trained"
        quantum = 100.0 / xt.shape[0]  # one test image
        # Proper two-sample statistics (VERDICT r2 #3: "within spread" is
        # nearly unfalsifiable when one outlier seed widens the ptp); under
        # --match-init also the paired per-seed design (build_row).
        row = build_row(name, epochs, bs, n, int(xt.shape[0]), args.seeds,
                        ref_accs, ours_accs, ref_t, ours_t,
                        args.match_init, 0, quantum)
        row["ref_provenance"] = ref_prov
        if fam.get("ruthotto_f32"):
            row["variant"] = "ruthotto_f32"
        rows.append(row)
        print(json.dumps(row), flush=True)
        if not args.no_record:
            _record_row(row)
        if args.bn_refresh:
            row_bn = build_row(name, epochs, bs, n, int(xt.shape[0]),
                               args.seeds, ref_bn, ours_bn, ref_t, ours_t,
                               args.match_init, args.bn_refresh, quantum)
            row_bn["ref_provenance"] = ref_prov
            if fam.get("ruthotto_f32"):
                row_bn["variant"] = "ruthotto_f32"
            rows_bn.append(row_bn)
            print(json.dumps(row_bn), flush=True)
            if not args.no_record:
                _record_row(row_bn)

    summary = _print_tables(rows, "reference-semantics")
    summary.update(_print_tables(rows_bn, f"bn-refresh-{args.bn_refresh}"))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
