#!/usr/bin/env python
"""Benchmark: CIFAR-10 training throughput (images/sec/chip) on the flagship
CIFAR10PDENoConv model — the BASELINE.md primary metric.

Measures the full jit'd training step (on-device augmentation + forward +
backward + grouped-AdamW update, reference batch size 64, cifar10.py:407) and
prints ONE JSON line.  The line also carries the measured champion configs
(PERF.md): bs-512 AMP training throughput (`value_bs512`) and W8A8
int8-linearized serving throughput (`serving_img_per_sec`,
serve.linearize_pde_layers dtype=int8, bs 1024 — the measured serving
frontier: int8 keeps climbing past bs 512 while bf16 declines,
PERF.md §serving-batch-frontier).

Fault tolerance (VERDICT r2 #1): the axon tunnel can drop mid-compile
(`remote_compile: read body closed` — BENCH_r02.json) or mid-execution.
Every device-touching measurement runs under a bounded retry
(fresh dispatch, backoff); an unrecoverable PRIMARY failure still emits one
self-describing error JSON (rc 1), and a secondary-measurement failure
nulls its field while the primary line stays green.

Artifact contract (VERDICT r4 #1 — BENCH_r04 was rc=124 with NOTHING
printed): (a) the primary line is printed + flushed the moment the primary
measurement completes, marked `"partial": true`; the enriched final line
(`"partial": false`) supersedes it — a mid-run kill can no longer lose the
round's number.  (b) `--deadline` (default 720 s from process start) skips
remaining secondary measurements once exceeded (`deadline_skipped` lists
them).  (c) every green run is appended to `perf/bench.jsonl` with
ts/git/argv provenance (tools/perf_record.py envelope).  The contract is
pinned by tests/test_bench_contract.py.

Baseline provenance: the reference cifar10.py CIFAR10PDENoConv training step
(torch CPU, batch 64, AdamW + clip, label smoothing 0.1) measured on this
machine's CPU at 11.99 images/sec (5.34 s/step; a 50k-image epoch = 69.5 min)
on 2026-08-16.  The reference has no GPU numbers (BASELINE.md); its only
published figure is the 40-minute MNIST CPU epoch (mnist_test.py:1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

BASELINE_IMG_PER_SEC = 11.99  # reference torch-CPU, measured (see docstring)

_START = time.monotonic()  # process start; --deadline counts from here

# TPU v5e (v5 lite) single-chip peaks, for utilization accounting
# (PERF.md §roofline): the flagship step is HBM/latency-bound, so the
# meaningful utilization axis is achieved HBM GB/s; MFU is reported too.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_GBPS = 819.0
V5E_PEAK_INT8_OPS = 394e12  # 2x the bf16 FLOPS peak (int8 MXU passes)

METRIC = "cifar10_train_images_per_sec_per_chip"


def _is_transient(exc) -> bool:
    """Tunnel/runtime faults worth retrying: the remote axon platform fails
    with INTERNAL/UNAVAILABLE JaxRuntimeErrors (stream drops, pool
    congestion, remote_compile body truncation) or raw socket errors."""
    if isinstance(exc, (OSError, ConnectionError)):
        return True
    name = type(exc).__name__
    if name not in ("JaxRuntimeError", "XlaRuntimeError"):
        return False
    msg = str(exc)
    return any(m in msg for m in (
        "INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED", "RESOURCE_EXHAUSTED",
        "remote_compile", "read body", "Socket closed", "connection",
        "Connection"))


def _retry(label, fn, attempts=3, backoffs=(5.0, 20.0)):
    """Run fn() with bounded retries on transient device faults.  Each retry
    is a FRESH dispatch (jax re-issues compile against the persistent remote
    cache, so a retry after a mid-compile drop is cheap).  Non-transient
    errors propagate immediately."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by _is_transient
            if not _is_transient(e) or i == attempts - 1:
                raise
            wait = backoffs[min(i, len(backoffs) - 1)]
            print(f"bench: transient fault in {label} "
                  f"(attempt {i + 1}/{attempts}): {type(e).__name__}: "
                  f"{str(e)[:200]}; retrying in {wait:.0f}s", file=sys.stderr)
            time.sleep(wait)


def _step_flops(step_fn, example_args):
    """Per-step FLOPs from XLA's compiled cost model (the FLOP count is
    fusion-invariant, unlike its "bytes accessed" operand count — see
    _analytic_train_traffic for why bytes come from an analytic model)."""
    import jax

    compiled = jax.jit(step_fn).lower(*example_args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax versions wrap per-computation
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _analytic_train_traffic(batch_size, n_sweeps, param_count, amp):
    """Documented LOWER-BOUND HBM byte count for one flagship train step, so
    the derived utilization is a conservative fraction in [0, 1] (VERDICT r3
    #3 — XLA's cost-model "bytes accessed" is a PRE-fusion operand count
    that exceeded physical peak by 2x and certified nothing).

    Counted streams (everything smaller is omitted, keeping this a true
    lower bound on physical traffic):
      * batch read + augmented write/read        : 3 x B*3*32*32*4 B
      * PDE evolution forward: each of the n_sweeps sequential sweeps
        streams the (B*3, 32, 32) state in and out (read + write); under
        AMP the state rides bf16 (2 B/elt), else f32
      * per-sweep residual save (write in fwd, read in bwd): 2 more passes
      * PDE evolution backward: cotangent read + write per sweep: 2 passes
      * optimizer: grouped-AdamW reads p, g, m, v and writes p, m, v, plus
        the global-norm clip pass reads g => 8 x param_bytes (f32)
    Head/attention/BN activations (~100 kB) and the batch-free coefficient
    chains are omitted.  The step's distance from HBM speed-of-light is
    structural — 51 *sequential* sweeps too small to saturate the memory
    system (PERF.md §roofline) — which is what the directly-measured
    sweep_core_gbps field quantifies.
    """
    state_bytes = batch_size * 3 * 32 * 32 * (2 if amp else 4)
    batch_bytes = batch_size * 3 * 32 * 32 * 4
    evolution = n_sweeps * 6 * state_bytes  # (2 fwd + 2 residual + 2 bwd)
    optimizer = 8 * param_count * 4
    return 3 * batch_bytes + evolution + optimizer


def measure_sweep_core(n):
    """Directly measure the irreducible PDE sweep core (PERF.md §roofline):
    one implicit x-sweep at flagship shapes — a batched PCR tridiagonal
    solve over the (64*3, 32, 32) f32 state, batch-free Neumann
    coefficients — chained n times in one jitted fori_loop.

    Effective bandwidth uses the PCR formulation's analytic traffic: the
    N=32 solve runs log2(32)=5 reduction levels, each streaming the batched
    RHS in and out (the (a,b,c) chains are batch-free and negligible), i.e.
    10 state-passes per sweep — the same accounting PERF.md §roofline used
    to establish ~360 GB/s ≈ 44% of the v5e HBM peak.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_pde_tpu.ops.adi import sweep_x

    g = np.random.default_rng(0)
    u0 = jnp.asarray(g.random((192, 32, 32)).astype(np.float32))
    alpha = jnp.asarray(g.random((32, 32)).astype(np.float32) + 0.5)

    @jax.jit
    def run_n(u):
        def body(i, u):
            return sweep_x(u, alpha, 0.001, 1.0, smooth=False, eps=1e-6)
        return jax.lax.fori_loop(0, n, body, u)

    out = run_n(u0)
    jax.block_until_ready(out)
    dt = _timed_loop(lambda: run_n(u0), lambda o: o, n)
    state_bytes = 192 * 32 * 32 * 4
    levels = 5  # log2(N=32) PCR reduction levels
    return {"gbps": 2 * levels * state_bytes / dt / 1e9, "dt": dt}


def _timed_loop(run_n, sync_tree, n, samples=3):
    """min-of-samples wall time for one n-iteration chained dispatch, synced
    by a real device→host value fetch (on the axon remote platform,
    block_until_ready alone has been observed to return before execution
    completes — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        out = run_n()
        float(jnp.sum(jax.tree_util.tree_leaves(sync_tree(out))[0]))
        best = min(best, time.perf_counter() - t0)
    return best / n


def measure_train(batch_size, iters, n_long, amp, want_cost):
    """Train-step throughput at `batch_size`; fresh model/trainer per call so
    a retry restarts from a clean dispatch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_pde_tpu.data import build_augment_fn
    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.train import Trainer
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset("cifar10_noconv")
    model = MODEL_REGISTRY[preset.model]()
    if amp:
        from cnn_pde_tpu.pde import enable_amp

        enable_amp(model)
    schedule = preset.make_schedule(steps_per_epoch=50_000 // batch_size)
    config = preset.make_train_config(batch_size=batch_size)
    trainer = Trainer(model, config, schedule,
                      augment_fn=build_augment_fn(preset.augment))

    state = trainer.init_state(jax.random.PRNGKey(0), None)
    raw_step = trainer._make_train_step(state.params).raw

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch_size, 3, 32, 32),
                                    ).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, batch_size).astype(np.int32))
    step_rng = jax.random.PRNGKey(1)

    # Wrap N steps in ONE jitted fori_loop: a single dispatch measures pure
    # device throughput, immune to host/tunnel dispatch latency.
    @jax.jit
    def run_n(n, params, mstate, ostate, images, labels, rng):
        def body(i, carry):
            p, m, o = carry
            p, m, o, loss, acc = raw_step(p, m, o, i, images, labels, rng)
            return (p, m, o)

        return jax.lax.fori_loop(0, n, body, (params, mstate, ostate))

    # compile + warmup
    out = run_n(iters, state.params, state.model_state,
                state.opt_state, images, labels, step_rng)
    jax.block_until_ready(out)
    dt = _timed_loop(
        lambda: run_n(n_long, *out, images, labels, step_rng),
        lambda o: o[0], n_long)

    result = {"img_per_sec": batch_size / dt, "dt": dt}
    if want_cost:
        try:
            flops = _step_flops(
                raw_step, (state.params, state.model_state, state.opt_state,
                           jnp.int32(0), images, labels, step_rng))
        except Exception:  # cost model unavailable on this backend
            flops = 0.0
        result["flops"] = flops
        # Post-fusion analytic LOWER bound on HBM traffic (see
        # _analytic_train_traffic): 51 sweeps = 3 branches x (5+8+4) Strang
        # steps x 3 substeps (MultiScaleExtractor._SCALES).
        n_sweeps = 51
        param_count = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(state.params))
        result["hbm_bytes"] = _analytic_train_traffic(
            batch_size, n_sweeps, param_count, amp)
    return result


def measure_serving_int8(batch_size, n):
    """W8A8 int8-linearized serving throughput (the measured serving
    champion, PERF.md §linearized-int8): each PDE branch's whole evolution
    as one int8 matmul with per-column scales + dynamic per-row activation
    quantization; chained-dispatch regime, weights as jit ARGUMENTS
    (PERF.md §serving-args)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnn_pde_tpu.models import MODEL_REGISTRY
    from cnn_pde_tpu.serve import linearize_pde_layers, make_predict_fn
    from cnn_pde_tpu.utils.config import get_preset

    preset = get_preset("cifar10_noconv")
    model = MODEL_REGISTRY[preset.model]()
    params, state = model.init(jax.random.PRNGKey(0))
    sample = jnp.zeros((1, 3, 32, 32), jnp.float32)
    n_lin = linearize_pde_layers(model, params, state, sample, dtype=jnp.int8)
    assert n_lin == 3, n_lin

    g = np.random.default_rng(0)
    images = jnp.asarray(
        g.random((batch_size, 3, 32, 32)).astype(np.float32))
    predict = make_predict_fn(model, params, state, output="labels")
    fwd, tree = predict.forward, predict.argtree

    @jax.jit
    def run_n(tree, x):
        def body(i, x):
            lbl = fwd(*tree, x)
            # fold the labels back in so the chain has a dependence
            return x + 1e-12 * lbl[:, None, None, None].astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    out = run_n(tree, images)  # compile + warmup
    jax.block_until_ready(out)
    dt = _timed_loop(lambda: run_n(tree, images), lambda o: o, n)
    return {"img_per_sec": batch_size / dt}


def _emit(record):
    """Print one JSON line and FLUSH — the driver may kill this process at
    any moment and keeps only what already reached stdout (BENCH_r04 was
    empty because everything printed at the very end)."""
    print(json.dumps(record))
    sys.stdout.flush()


def _bank(record, bank_dir=None):
    """Append a green run to perf/bench.jsonl with ts/git/argv provenance
    (same envelope as the other harnesses — tools/perf_record.py), so bench
    numbers exist in an auditable record, not just the driver's capture."""
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import perf_record

        perf_record.record("bench", record, perf_dir=bank_dir)
    except Exception as e:  # noqa: BLE001 — banking must never kill the run
        print(f"bench: perf/bench.jsonl banking failed: {e}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--quick", action="store_true", help="fewer timing iters")
    ap.add_argument("--platform", default=None,
                    help="force the jax platform (e.g. 'cpu' for a smoke "
                    "run off-TPU); default: the environment's device")
    ap.add_argument("--probe-timeout", type=float, default=300.0,
                    help="seconds to wait for the device platform before "
                    "emitting an error JSON instead of hanging (the axon "
                    "tunnel can stall indefinitely under pool congestion)")
    ap.add_argument("--deadline", type=float, default=720.0,
                    help="global wall-clock budget (s, from process start): "
                    "once exceeded, remaining SECONDARY measurements are "
                    "skipped and whatever is measured is emitted — the "
                    "driver's window must never expire on an all-or-nothing "
                    "tail (BENCH_r04 was rc=124 with nothing printed)")
    ap.add_argument("--no-champions", action="store_true",
                    help="skip the secondary bs-512 train and int8-serving "
                    "measurements (primary bs-64 row only)")
    ap.add_argument("--bank-dir", default=None,
                    help="directory for the bench.jsonl provenance record "
                    "(default: repo perf/); tests point this at a tmpdir")
    ap.add_argument("--no-bank", action="store_true",
                    help="skip the perf/bench.jsonl append")
    ap.add_argument("--hang-after-primary", action="store_true",
                    help=argparse.SUPPRESS)  # test hook: sleep forever after
    # the primary line is flushed, simulating a mid-run stall/kill
    amp_group = ap.add_mutually_exclusive_group()
    amp_group.add_argument(
        "--amp", dest="amp", action="store_true", default=True,
        help="bf16 hoisted-inverse solves (pde.enable_amp) — the AMP "
             "analogue of the autocast the reference trains this model "
             "under (cifar10.py:440). DEFAULT: accuracy under AMP is "
             "validated equal to f32 on every preset (PERF.md "
             "§all-presets). The exact-parity surface stays f32 (pcr).")
    amp_group.add_argument("--f32", dest="amp", action="store_false",
                           help="exact-f32 solves (pcr) — the parity surface")
    args = ap.parse_args()
    if args.quick:
        args.iters = 5

    def fail(detail):
        print(json.dumps({
            "metric": METRIC, "value": None, "unit": "images/sec",
            "vs_baseline": None, "error": detail,
        }))
        sys.exit(1)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        # Probe device availability in a TIME-BOUNDED subprocess before any
        # in-process backend init: a stalled remote tunnel makes
        # jax.devices() hang forever, which would leave the driver's bench
        # record empty.  A probe failure emits a self-describing error JSON
        # (rc 1) instead; the detail distinguishes timeout (congestion) from
        # platform-init failure (e.g. libtpu mismatch, with the stderr line).
        from cnn_pde_tpu.utils.devprobe import probe_devices

        ok, detail = probe_devices(timeout=args.probe_timeout)
        if not ok:
            fail(f"device platform unreachable ({detail}); "
                 "no measurement taken")

    # --quick shortens the chained loops (smoke-grade timing, e.g. off-TPU).
    # Chain lengths are sized so the per-sample dispatch+fetch round trip
    # (15-60 ms over the tunnel) stays <5% of the timed window: bs-512 steps
    # run ~6-7 ms (200 -> ~1.3 s/sample) and int8-serving batches ~0.2 ms
    # (2000 -> ~0.4 s/sample).  BENCH_r02-era short chains (50 / 200) biased
    # the champion fields 15-40% low vs the PERF.md harnesses.
    n_long = args.iters if args.quick else max(200, args.iters)
    n_512 = args.iters if args.quick else max(200, args.iters)
    n_serve = 20 if args.quick else 2000

    # PRIMARY: bs-64 training throughput (the BASELINE.md metric).  An
    # unrecoverable failure here still produces one parseable error line.
    try:
        primary = _retry("train bs%d" % args.batch_size, lambda: measure_train(
            args.batch_size, args.iters, n_long, args.amp, want_cost=True))
    except Exception as e:  # noqa: BLE001 — the driver needs ONE json line
        fail(f"{type(e).__name__}: {str(e)[:400]}")
        return  # unreachable; keeps linters honest

    img_per_sec, dt = primary["img_per_sec"], primary["dt"]
    flops, hbm_bytes = primary["flops"], primary["hbm_bytes"]
    mfu = flops / dt / V5E_PEAK_BF16_FLOPS if flops else None
    hbm_gbps = hbm_bytes / dt / 1e9 if hbm_bytes else None

    # Flush a self-describing PRIMARY line the moment it exists (VERDICT r4
    # #1): if anything later stalls past the driver's window, this line is
    # already in the capture.  The enriched final line supersedes it —
    # consumers keep the LAST line whose "partial" is false, else the last
    # line at all.
    _emit({
        "metric": METRIC, "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 2),
        "epoch_s": round(50_000 / img_per_sec, 2),
        "mfu": round(mfu, 5) if mfu is not None else None,
        "hbm_gbps": round(hbm_gbps, 1) if hbm_gbps is not None else None,
        "hbm_util": (round(min(hbm_gbps / V5E_PEAK_HBM_GBPS, 1.0), 3)
                     if hbm_gbps is not None else None),
        "amp": bool(args.amp), "partial": True,
    })
    if args.hang_after_primary:  # test hook: simulate a mid-run stall
        time.sleep(3600)

    def over_deadline(label):
        left = args.deadline - (time.monotonic() - _START)
        if left <= 0:
            print(f"bench: deadline exceeded; skipping {label}",
                  file=sys.stderr)
            return True
        return False

    skipped = []

    # Roofline context (VERDICT r3 #3): the directly-measured sweep core —
    # the step's irreducible sequential inner op — against the HBM peak.
    sweep_core_gbps = None
    if over_deadline("sweep core"):
        skipped.append("sweep_core")
    else:
        try:
            sweep_core_gbps = _retry(
                "sweep core",
                lambda: measure_sweep_core(50 if args.quick else 2000))["gbps"]
        except Exception as e:  # noqa: BLE001 — context field only
            print(f"bench: sweep-core measurement failed: {e}",
                  file=sys.stderr)

    # SECONDARY champion configs (PERF.md): failures null the field but the
    # primary record stays green.
    errors = {}
    value_bs256 = value_bs512 = serving_img_per_sec = None
    if not args.no_champions:
        if over_deadline("train bs256"):
            skipped.append("bs256")
        else:
            try:
                # bs 256 is the measured TRAINING throughput peak (PERF.md
                # §train-batch-frontier: 84k > 79k @512 > 71k @1024 in one
                # window); bs 512 kept for cross-round comparability
                n_256 = args.iters if args.quick else max(400, args.iters)
                value_bs256 = _retry("train bs256", lambda: measure_train(
                    256, args.iters, n_256, args.amp,
                    want_cost=False))["img_per_sec"]
            except Exception as e:  # noqa: BLE001
                errors["bs256"] = f"{type(e).__name__}: {str(e)[:200]}"
        if over_deadline("train bs512"):
            skipped.append("bs512")
        else:
            try:
                value_bs512 = _retry("train bs512", lambda: measure_train(
                    512, args.iters, n_512, args.amp,
                    want_cost=False))["img_per_sec"]
            except Exception as e:  # noqa: BLE001
                errors["bs512"] = f"{type(e).__name__}: {str(e)[:200]}"
        if over_deadline("serving int8"):
            skipped.append("serving")
        else:
            try:
                serving_img_per_sec = _retry(
                    "serving int8 bs1024",
                    lambda: measure_serving_int8(
                        1024, n_serve))["img_per_sec"]
            except Exception as e:  # noqa: BLE001
                errors["serving"] = f"{type(e).__name__}: {str(e)[:200]}"

    record = {
        "metric": METRIC,
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 2),
        # the BASELINE.md primary metric pairs throughput with epoch time
        # (50k-image CIFAR-10 epoch; reference CPU epoch ≈ 69.5 min)
        "epoch_s": round(50_000 / img_per_sec, 2),
        # measured champion configs (PERF.md §train-batch-frontier,
        # §serving-batch-frontier)
        "value_bs256": (round(value_bs256, 2)
                        if value_bs256 is not None else None),
        "value_bs512": (round(value_bs512, 2)
                        if value_bs512 is not None else None),
        "serving_img_per_sec": (round(serving_img_per_sec, 1)
                                if serving_img_per_sec is not None else None),
        "serving_config": "linearized int8 W8A8, bs 1024, labels",
        # Utilization (VERDICT r3 #3): hbm_gbps/hbm_util come from a
        # documented post-fusion analytic LOWER bound on step traffic
        # (_analytic_train_traffic), so hbm_util is a conservative fraction
        # in [0, 1].  The step's distance from speed-of-light is structural
        # (51 sequential sweeps each too small to saturate HBM); the
        # directly-measured sweep-core fields quantify the core itself, and
        # serving_int8_peak_frac the int8 serving path against the MXU int8
        # peak (both per PERF.md §roofline).  MFU is for completeness — the
        # step is bandwidth/latency-bound, not FLOP-bound.
        "mfu": round(mfu, 5) if mfu is not None else None,
        "hbm_gbps": round(hbm_gbps, 1) if hbm_gbps is not None else None,
        "hbm_util": (round(min(hbm_gbps / V5E_PEAK_HBM_GBPS, 1.0), 3)
                     if hbm_gbps is not None else None),
        "hbm_basis": "analytic post-fusion lower-bound traffic "
                     "(bench.py::_analytic_train_traffic)",
        "sweep_core_gbps": (round(sweep_core_gbps, 1)
                            if sweep_core_gbps is not None else None),
        "sweep_core_roofline_frac": (
            round(sweep_core_gbps / V5E_PEAK_HBM_GBPS, 3)
            if sweep_core_gbps is not None else None),
        # full serving step's int8-matmul work rate vs the v5e int8 peak:
        # 3 branch evolutions x (3072 x 3072) x 2 ops/MAC per image; the
        # isolated evolution matmuls alone measure ~76% of peak (PERF.md
        # §linearized-int8), the gap is the nonlinear tail (gates/pool/FC).
        "serving_int8_peak_frac": (
            round(serving_img_per_sec * 3 * 3072**2 * 2 / V5E_PEAK_INT8_OPS,
                  3) if serving_img_per_sec is not None else None),
        "amp": bool(args.amp),
        "partial": False,
    }
    if errors:
        record["secondary_errors"] = errors
    if skipped:
        record["deadline_skipped"] = skipped
    _emit(record)
    if not args.no_bank:
        _bank(record, bank_dir=args.bank_dir)


if __name__ == "__main__":
    main()
