"""Machine-readable perf records + drift check (VERDICT r2 #6).

The bench harnesses (`bench_serve.py`, `bench_presets.py`, `bench_http.py`)
append one JSONL record per run to ``perf/<harness>.jsonl``:

    {"ts": ..., "harness": ..., "platform": ..., "device": ..., "git": ...,
     "argv": [...], "results": {<variant>: {<metric>: value, ...}, ...}}

so PERF.md's tables are regression-checkable instead of prose-only.

Drift check:

    python tools/perf_record.py --check [--threshold 0.15] [--perf-dir perf]

compares the newest record against the previous record *on the same
platform+device* for every harness file, inferring metric direction from the
name (throughput-like: higher is better; ms/latency-like: lower is better),
and exits 1 if any metric regressed beyond the threshold.  Records from
different platforms/devices never compare (a CPU smoke must not "regress"
a TPU record), and single-record files pass trivially.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# metric-name fragments → direction (+1 higher-better, -1 lower-better).
# _HIGHER is consulted first, so "req_per_s"/"per_sec" win over the
# generic "_s" seconds suffix.
_HIGHER = ("images_per_sec", "img_per_sec", "throughput_rps", "per_sec",
           "req_per_s", "speedup", "mfu", "util")
_LOWER = ("ms_per", "_ms", "latency", "epoch_s", "seconds", "_s")


def metric_direction(name):
    """+1 (higher is better), -1 (lower is better), 0 (not comparable)."""
    if any(f in name for f in _HIGHER):
        return 1
    if any(f in name for f in _LOWER):
        return -1
    return 0


def record(harness, results, perf_dir=None, extra=None):
    """Append one run record to perf/<harness>.jsonl; returns the path."""
    import jax

    perf_dir = perf_dir or os.path.join(_REPO, "perf")
    os.makedirs(perf_dir, exist_ok=True)
    try:
        git = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             cwd=_REPO, capture_output=True, text=True,
                             timeout=10).stdout.strip() or None
    except Exception:
        git = None
    dev = jax.devices()[0]
    rec = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "harness": harness,
        "platform": dev.platform,
        "device": getattr(dev, "device_kind", str(dev)),
        "git": git,
        "argv": sys.argv[1:],
        "results": results,
    }
    if extra:
        rec.update(extra)
    path = os.path.join(perf_dir, f"{harness}.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return path


def _flatten(results, prefix=""):
    """{variant: {metric: v}} or {metric: v} → {dotted_name: float}."""
    out = {}
    for k, v in results.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, prefix=name + "."))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            out[name] = float(v)
    return out


def check_drift(perf_dir=None, threshold=0.15):
    """Compare the newest record per harness against the previous same-
    platform+device record.  Returns (regressions, improvements, messages)."""
    perf_dir = perf_dir or os.path.join(_REPO, "perf")
    regressions, improvements, messages = [], [], []
    if not os.path.isdir(perf_dir):
        return regressions, improvements, ["no perf/ directory; nothing to check"]
    for fname in sorted(os.listdir(perf_dir)):
        if not fname.endswith(".jsonl"):
            continue
        with open(os.path.join(perf_dir, fname)) as f:
            recs = [json.loads(line) for line in f if line.strip()]
        # only harness-envelope records are drift-comparable (the per-seed
        # parity bank parity_seeds.jsonl uses a flat per-seed schema)
        recs = [r for r in recs if isinstance(r.get("results"), dict)]
        if not recs:
            continue
        latest = recs[-1]
        key = (latest.get("platform"), latest.get("device"))
        prior = [r for r in recs[:-1]
                 if (r.get("platform"), r.get("device")) == key]
        if not prior:
            messages.append(f"{fname}: no prior record on {key}; baseline set")
            continue
        prev = prior[-1]
        a, b = _flatten(prev["results"]), _flatten(latest["results"])
        for name in sorted(set(a) & set(b)):
            d = metric_direction(name)
            if d == 0 or a[name] == 0:
                continue
            rel = (b[name] - a[name]) / abs(a[name]) * d  # + = improvement
            line = (f"{fname}:{name}: {a[name]:g} -> {b[name]:g} "
                    f"({rel * 100:+.1f}% {'better' if rel >= 0 else 'worse'})")
            if rel < -threshold:
                regressions.append(line)
            elif rel > threshold:
                improvements.append(line)
            messages.append(line)
    return regressions, improvements, messages


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--check", action="store_true",
                    help="drift-check the newest record per harness against "
                    "its predecessor (same platform+device)")
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="relative regression beyond which --check fails")
    ap.add_argument("--perf-dir", default=None)
    ap.add_argument("--verbose", action="store_true",
                    help="print every compared metric, not just drifts")
    args = ap.parse_args(argv)
    if not args.check:
        ap.error("nothing to do (records are appended by the harnesses; "
                 "use --check)")
    regressions, improvements, messages = check_drift(
        perf_dir=args.perf_dir, threshold=args.threshold)
    if args.verbose:
        for m in messages:
            print(m)
    for m in improvements:
        print(f"IMPROVED  {m}")
    for m in regressions:
        print(f"REGRESSED {m}")
    print(json.dumps({"regressions": len(regressions),
                      "improvements": len(improvements),
                      "compared": len(messages)}))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
