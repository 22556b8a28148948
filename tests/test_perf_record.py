"""perf_record: machine-readable bench records + drift check (VERDICT r2 #6)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import perf_record  # noqa: E402


def test_record_appends_jsonl(tmp_path):
    p1 = perf_record.record("bench_x", {"v": {"images_per_sec": 100.0}},
                            perf_dir=str(tmp_path), extra={"note": "a"})
    p2 = perf_record.record("bench_x", {"v": {"images_per_sec": 90.0}},
                            perf_dir=str(tmp_path))
    assert p1 == p2 == str(tmp_path / "bench_x.jsonl")
    recs = [json.loads(line) for line in open(p1)]
    assert len(recs) == 2
    assert recs[0]["harness"] == "bench_x" and recs[0]["note"] == "a"
    assert recs[0]["platform"] == "cpu"  # conftest forces cpu
    assert recs[1]["results"]["v"]["images_per_sec"] == 90.0
    assert "ts" in recs[0] and "device" in recs[0]


def test_drift_directions_and_threshold(tmp_path):
    # record 1 (baseline) then record 2 with one regression (throughput
    # down 20%), one improvement (latency down 50%), one stable metric
    perf_record.record("bench_y", {
        "a": {"images_per_sec": 100.0, "latency_ms_median": 10.0,
              "ms_per_step": 5.0}}, perf_dir=str(tmp_path))
    perf_record.record("bench_y", {
        "a": {"images_per_sec": 80.0, "latency_ms_median": 5.0,
              "ms_per_step": 5.1}}, perf_dir=str(tmp_path))
    reg, imp, msgs = perf_record.check_drift(perf_dir=str(tmp_path),
                                             threshold=0.15)
    assert len(reg) == 1 and "images_per_sec" in reg[0]
    assert len(imp) == 1 and "latency" in imp[0]
    assert any("ms_per_step" in m for m in msgs)  # compared, within band
    # the CLI exits 1 on regressions, 0 otherwise
    assert perf_record.main(["--check", "--perf-dir", str(tmp_path)]) == 1
    assert perf_record.main(["--check", "--perf-dir", str(tmp_path),
                             "--threshold", "0.5"]) == 0


def test_drift_ignores_other_platforms(tmp_path):
    path = tmp_path / "bench_z.jsonl"
    base = {"harness": "bench_z", "ts": "t"}
    with open(path, "w") as f:
        f.write(json.dumps({**base, "platform": "tpu", "device": "v5e",
                            "results": {"images_per_sec": 1000.0}}) + "\n")
        f.write(json.dumps({**base, "platform": "cpu", "device": "cpu",
                            "results": {"images_per_sec": 10.0}}) + "\n")
    reg, imp, msgs = perf_record.check_drift(perf_dir=str(tmp_path))
    # the cpu record must not "regress" the tpu baseline
    assert not reg and not imp
    assert any("baseline set" in m for m in msgs)


def test_metric_direction():
    assert perf_record.metric_direction("images_per_sec") == 1
    assert perf_record.metric_direction("req_per_s") == 1
    assert perf_record.metric_direction("microbatch_speedup") == 1
    assert perf_record.metric_direction("ms_per_step") == -1
    assert perf_record.metric_direction("latency_ms_p90") == -1
    assert perf_record.metric_direction("wall_s") == -1
    assert perf_record.metric_direction("dispatches") == 0
