"""The driver-artifact contract of bench.py (VERDICT r4 #1/#6).

BENCH_r04.json was rc=124 with nothing printed: bench.py printed its single
JSON line only at the very end, so a stall anywhere produced an empty round
artifact.  These tests pin the repaired contract against real subprocess
runs (CPU platform, --quick, --f32 — the AMP bf16 dot is unsupported on the
CPU backend):

  * a run whose secondaries are all skipped by the global --deadline still
    emits parseable JSON (a flushed partial primary line + the final line)
    and banks a ts/git/argv provenance row to bench.jsonl;
  * a simulated mid-run stall after the primary (--hang-after-primary) is
    killed, and the already-flushed primary line survives in the capture —
    the exact failure mode of BENCH_r04 can no longer lose the number.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _json_lines(text):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def test_deadline_skips_secondaries_but_emits_and_banks(tmp_path):
    proc = subprocess.run(
        [sys.executable, BENCH, "--quick", "--platform", "cpu", "--f32",
         "--deadline", "0", "--no-champions", "--bank-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    recs = _json_lines(proc.stdout)
    assert len(recs) >= 2, proc.stdout
    partials = [r for r in recs if r.get("partial")]
    finals = [r for r in recs if r.get("partial") is False]
    assert partials and finals
    final = finals[-1]
    assert final["value"] and final["value"] > 0
    assert final["unit"] == "images/sec"
    assert "sweep_core" in final.get("deadline_skipped", [])
    # provenance row banked with the perf_record envelope
    bank = os.path.join(str(tmp_path), "bench.jsonl")
    assert os.path.exists(bank)
    with open(bank) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    assert len(rows) == 1
    row = rows[0]
    for key in ("ts", "git", "argv", "platform", "results"):
        assert key in row, row.keys()
    assert row["results"]["value"] == final["value"]


def test_midrun_kill_preserves_flushed_primary_line(tmp_path):
    """--hang-after-primary sleeps forever right after the primary line is
    flushed; the test kills the process as soon as the line arrives and
    asserts the capture already holds a parseable primary record."""
    proc = subprocess.Popen(
        [sys.executable, BENCH, "--quick", "--platform", "cpu", "--f32",
         "--hang-after-primary", "--no-bank"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        bufsize=1, cwd=REPO)
    primary = None
    deadline = time.monotonic() + 540
    try:
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            line = line.strip()
            if line.startswith("{"):
                primary = json.loads(line)
                break
    finally:
        proc.kill()
        proc.wait(timeout=30)
    assert primary is not None, "no JSON line arrived before the kill"
    assert primary.get("partial") is True
    assert primary["value"] and primary["value"] > 0
    assert primary["metric"] == "cifar10_train_images_per_sec_per_chip"
