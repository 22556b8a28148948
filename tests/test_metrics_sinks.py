"""Structured metrics sinks (train/sinks.py): unit behavior of each sink
plus the Trainer.fit integration — every epoch record lands in the file,
flushed as produced, with test_acc attached on eval epochs.

The reference has no durable metrics trail (stdout prints only,
mnist_test.py:318-323); this subsystem is framework-added, so the tests
pin OUR contract rather than reference parity."""

import csv
import json

import jax
import numpy as np
import pytest

from cnn_pde_tpu.data import load_dataset
from cnn_pde_tpu.models import MNISTClassifier
from cnn_pde_tpu.train import TrainConfig, Trainer
from cnn_pde_tpu.train.sinks import (CSVSink, JSONLSink, MetricsSink,
                                     MultiSink, TensorBoardSink,
                                     sink_from_path)


def test_jsonl_sink_roundtrip(tmp_path):
    p = tmp_path / "m.jsonl"
    with JSONLSink(p) as s:
        s.log({"epoch": 1, "loss": 2.5, "acc": np.float32(10.0)})
        s.log({"epoch": 2, "loss": 2.0, "acc": 20.0, "test_acc": 25.0})
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["loss"] == 2.5 and lines[0]["acc"] == 10.0
    assert lines[1]["test_acc"] == 25.0
    assert all("wall_time" in l for l in lines)
    # numpy scalar was coerced to a plain float
    assert isinstance(lines[0]["acc"], float)


def test_jsonl_sink_appends_and_drops_nonscalar(tmp_path):
    p = tmp_path / "m.jsonl"
    with JSONLSink(p) as s:
        s.log({"epoch": 1, "loss": 1.0, "junk": object()})
    with JSONLSink(p) as s:  # re-open appends (resume-friendly)
        s.log({"epoch": 2, "loss": 0.5})
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert [l["epoch"] for l in lines] == [1, 2]
    assert "junk" not in lines[0]


def test_csv_sink_header_and_missing_fields(tmp_path):
    p = tmp_path / "m.csv"
    with CSVSink(p) as s:
        s.log({"epoch": 1, "loss": 2.5, "acc": 10.0, "time": 0.1, "chunk": 1})
        s.log({"epoch": 2, "loss": 2.0, "acc": 20.0, "time": 0.1, "chunk": 1,
               "test_acc": 25.0})
    rows = list(csv.DictReader(p.open()))
    assert len(rows) == 2
    # test_acc has a column even though the FIRST record lacked it
    assert rows[0]["test_acc"] == "" and rows[1]["test_acc"] == "25.0"
    assert rows[1]["loss"] == "2.0"


def test_multi_sink_fans_out(tmp_path):
    pj, pc = tmp_path / "m.jsonl", tmp_path / "m.csv"
    with MultiSink(JSONLSink(pj), CSVSink(pc)) as s:
        s.log({"epoch": 1, "loss": 1.0, "acc": 5.0})
    assert json.loads(pj.read_text())["loss"] == 1.0
    assert list(csv.DictReader(pc.open()))[0]["loss"] == "1.0"


def test_sink_from_path_dispatch(tmp_path):
    assert isinstance(sink_from_path(tmp_path / "a.jsonl"), JSONLSink)
    assert isinstance(sink_from_path(tmp_path / "a.ndjson"), JSONLSink)
    assert isinstance(sink_from_path(tmp_path / "a.csv"), CSVSink)
    with pytest.raises(ValueError, match="unknown metrics sink"):
        sink_from_path(tmp_path / "a.txt")
    # directory → TensorBoard; the package may be absent in this image, in
    # which case the gate must raise the documented ImportError
    try:
        s = sink_from_path(tmp_path / "tbdir")
        s.close()
    except ImportError as e:
        assert "JSONLSink" in str(e)


def test_base_sink_is_noop_context_manager():
    with MetricsSink() as s:
        s.log({"epoch": 1})  # must not raise


def test_fit_streams_every_epoch_record(tmp_path):
    """fit(metrics_sink=...) logs one record per epoch with a 1-based
    'epoch' key, test_acc present exactly on eval epochs, and the records
    matching the returned history."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=4, batch_size=16, eval_every=2,
                      log_every=10**9)
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(jax.random.PRNGKey(0), None)
    p = tmp_path / "metrics.jsonl"
    sink = JSONLSink(p)
    result = trainer.fit(state, ds, verbose=False, metrics_sink=sink)
    sink.close()
    recs = [json.loads(l) for l in p.read_text().splitlines()]
    assert [r["epoch"] for r in recs] == list(range(1, len(recs) + 1))
    assert len(recs) == len(result["history"])
    for r, h in zip(recs, result["history"]):
        assert abs(r["loss"] - h["loss"]) < 1e-9
    # eval cadence: epochs 2 and 4 carry test_acc, 1 and 3 don't
    assert [("test_acc" in r) for r in recs] == [False, True, False, True]


def test_fit_streams_fused_device_epoch_records(tmp_path):
    """Under fused multi-epoch dispatch each epoch still gets its own
    record, tagged with chunk>1 so consumers know 'time' is averaged."""
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=8, synthetic_test_per_class=3)
    model = MNISTClassifier()
    cfg = TrainConfig(epochs=4, batch_size=16, eval_every=4,
                      device_epoch=True, log_every=10**9)
    trainer = Trainer(model, cfg, lambda s: 1e-3)
    state = trainer.init_state(jax.random.PRNGKey(0), None)
    p = tmp_path / "metrics.jsonl"
    with JSONLSink(p) as sink:
        trainer.fit(state, ds, verbose=False, metrics_sink=sink)
    recs = [json.loads(l) for l in p.read_text().splitlines()]
    assert [r["epoch"] for r in recs] == [1, 2, 3, 4]
    assert all(r["chunk"] == 4 for r in recs)
    assert "test_acc" in recs[-1]


def test_tensorboard_sink_gated_or_working(tmp_path):
    try:
        s = TensorBoardSink(tmp_path / "tb")
    except ImportError as e:
        assert "tensorboard" in str(e)
        return
    s.log({"epoch": 1, "loss": 2.0, "acc": 10.0})
    s.close()
    assert any((tmp_path / "tb").iterdir())
