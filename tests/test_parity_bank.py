"""The parity evidence-durability contracts (VERDICT r4 #2 / ADVICE r4):
the per-seed incremental bank in tools/parity_run.py (a family timeout must
never discard finished seeds) and the provenance rules of the family-level
--ref-accs-from cache (derivative rows must never shadow torch-trained
provenance).  Pure-python — no training, no jax."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "parity_run", os.path.join(REPO, "tools", "parity_run.py"))
parity_run = importlib.util.module_from_spec(spec)
sys.modules["parity_run_for_tests"] = parity_run
spec.loader.exec_module(parity_run)


META = {"family": "mnist", "epochs": 5, "batch": 20, "train_n": 80,
        "test_n": 40, "bn_refresh": 66, "platform": "cpu",
        "match_init": True, "variant": None}


def test_seed_bank_roundtrip_and_resume(tmp_path):
    path = str(tmp_path / "seeds.jsonl")
    bank = {"path": path, "rows": {}, "meta": META}
    parity_run._bank_seed(bank, META, "ours", 0, 35.0, 35.0, 19.3)
    parity_run._bank_seed(bank, dict(META, platform="torch-cpu"),
                          "ref", 0, 30.0, 31.0, 20.0)
    # a fresh process reloads the same records
    rows = parity_run._seed_bank_load(path)
    assert len(rows) == 2
    rec = parity_run._banked_seed({"path": path, "rows": rows}, META,
                                  "ours", 0, need_bn=True)
    assert rec is not None and rec["acc"] == 35.0 and rec["acc_bn"] == 35.0
    assert rec["ts"] and "git" in rec
    # unbanked seed, different platform, different fixture: all misses
    assert parity_run._banked_seed({"path": path, "rows": rows}, META,
                                   "ours", 1, need_bn=False) is None
    assert parity_run._banked_seed(
        {"path": path, "rows": rows}, dict(META, platform="tpu"),
        "ours", 0, need_bn=False) is None
    assert parity_run._banked_seed(
        {"path": path, "rows": rows}, dict(META, epochs=8),
        "ours", 0, need_bn=False) is None
    # variant keys are distinct (the hybrid f32 grade must not collide)
    assert parity_run._banked_seed(
        {"path": path, "rows": rows}, dict(META, variant="ruthotto_f32"),
        "ours", 0, need_bn=False) is None


def test_seed_bank_dual_eval_requirement(tmp_path):
    """A seed banked WITHOUT the bn eval cannot serve a dual-eval run."""
    path = str(tmp_path / "seeds.jsonl")
    meta = dict(META, bn_refresh=0)
    bank = {"path": path, "rows": {}, "meta": meta}
    parity_run._bank_seed(bank, meta, "ours", 3, 42.0, None, 1.0)
    rows = parity_run._seed_bank_load(path)
    assert parity_run._banked_seed({"path": path, "rows": rows}, meta,
                                   "ours", 3, need_bn=False) is not None
    assert parity_run._banked_seed({"path": path, "rows": rows}, meta,
                                   "ours", 3, need_bn=True) is None


def _envelope(argv, key, row):
    return json.dumps({"ts": "t", "argv": argv, "results": {key: row}})


def _row(family="mnist", bn=0, seeds=8, match_init=True, tag=None,
         epochs=5):
    r = {"family": family, "epochs": epochs, "batch": 20, "train_n": 80,
         "test_n": 40, "ref_accs": [50.0] * seeds, "match_init": match_init}
    if bn:
        r["bn_refresh"] = bn
    if tag:
        r["tag"] = tag
    return r


def test_ref_cache_skips_derivative_rows(tmp_path):
    """Envelope rows whose own argv used --ref-accs-from are derivative and
    must never shadow (or even precede) the torch-trained provenance row."""
    p = tmp_path / "bank.jsonl"
    p.write_text("\n".join([
        _envelope(["--ref-accs-from", "x.jsonl"], "mnist",
                  _row(tag="derivative")),
        _envelope(["--match-init"], "mnist", _row(tag="provenance")),
        _envelope(["--ref-accs-from", "x.jsonl"], "mnist",
                  _row(tag="derivative2")),
    ]) + "\n")
    cache = parity_run.load_ref_cache(str(p))
    rows = cache[("mnist", 0)]
    assert [r.get("tag") for r in rows] == ["provenance"]


def test_ref_cache_provenance_field_beats_argv_heuristic(tmp_path):
    """Rows carrying the explicit ref_provenance field are filtered on it:
    a run that was OFFERED a cache (--ref-accs-from in argv) but fixture-
    missed and actually TRAINED its torch side stays usable provenance;
    'cached' rows are skipped regardless of argv."""
    p = tmp_path / "bank.jsonl"
    trained = dict(_row(tag="trained-despite-argv"), ref_provenance="trained")
    cached = dict(_row(tag="cached"), ref_provenance="cached")
    p.write_text("\n".join([
        _envelope(["--ref-accs-from", "x.jsonl"], "mnist", trained),
        _envelope([], "mnist", cached),
    ]) + "\n")
    cache = parity_run.load_ref_cache(str(p))
    assert [r.get("tag") for r in cache[("mnist", 0)]] == [
        "trained-despite-argv"]


def test_ref_cache_first_fixture_match_wins(tmp_path):
    p = tmp_path / "bank.jsonl"
    p.write_text("\n".join([
        _envelope([], "mnist", _row(tag="first", epochs=3)),   # wrong fixture
        _envelope([], "mnist", _row(tag="second")),            # matches
        _envelope([], "mnist", _row(tag="third")),             # later shadow
    ]) + "\n")
    cache = parity_run.load_ref_cache(str(p))

    def cache_ok(c):
        return c.get("epochs") == 5 and len(c.get("ref_accs", [])) >= 8

    picked = parity_run.pick_cached_row(cache, ("mnist", 0), cache_ok, True)
    assert picked["tag"] == "second"


def test_ref_cache_requires_match_init_when_paired(tmp_path):
    p = tmp_path / "bank.jsonl"
    p.write_text(_envelope([], "mnist", _row(match_init=False)) + "\n"
                 + json.dumps(_row(match_init=True, tag="raw-line")) + "\n")
    cache = parity_run.load_ref_cache(str(p))
    rows = cache[("mnist", 0)]
    assert len(rows) == 2  # raw row lines (no argv) are accepted as-is

    def cache_ok(c):
        return True

    picked = parity_run.pick_cached_row(cache, ("mnist", 0), cache_ok, True)
    assert picked["tag"] == "raw-line"  # the non-match_init row is skipped
    unpaired = parity_run.pick_cached_row(cache, ("mnist", 0), cache_ok,
                                          False)
    assert unpaired.get("tag") is None  # without --match-init, first wins
