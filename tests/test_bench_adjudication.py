"""Unit tests for bench.py's machine-made drift adjudication (r10,
VERDICT r9 task 5) — the verdict logic, the re-measure cap, and the
history-baseline substitution that stops a host_drift reading from
ratcheting the flag line."""

from __future__ import annotations

import json
import unittest.mock as mock

import bench


def test_adjudicate_flagged_verdicts_and_cap():
    # flat filler keeps the median ratio ~1.0: this scenario tests the
    # PER-QUERY path, not the diffuse run-level detector
    flat = {f"f{i}": 1.0 for i in range(20)}
    timings = {"a": 15.0, "b": 3.0, "c": 9.0, **flat}
    last_clean = {"a": 10.0, "b": 2.9, "c": 5.0, **flat}
    hist = [{"a": 9.5, "c": 5.2}, {"a": 10.0, "c": 5.0}]

    def fake_fresh(name, sf_dir):
        return {"a": 10.1, "c": 8.8}[name]

    with mock.patch.object(bench, "_fresh_process_best", fake_fresh):
        out = bench._adjudicate_flagged(timings, last_clean, hist, "/x")
    # a: flagged (15 > 1.2*10), fresh back under the line -> host_drift
    # b: 3 <= 1.2*2.9 — not flagged at all
    # c: flagged, fresh stays above line AND band -> regression
    assert set(out) == {"a", "c"}
    assert out["a"]["verdict"] == "host_drift"
    assert out["a"]["band"] == [9.5, 10.0]
    assert out["c"]["verdict"] == "regression"
    assert out["c"]["fresh_process"] == 8.8

    # the re-measure cap: beyond MAX_ADJUDICATIONS, verdict=unmeasured
    timings2 = {f"q{i}": 10.0 for i in range(bench.MAX_ADJUDICATIONS + 2)}
    clean2 = {n: 1.0 for n in timings2}
    timings2.update({f"g{i}": 1.0 for i in range(40)})
    clean2.update({f"g{i}": 1.0 for i in range(40)})
    with mock.patch.object(bench, "_fresh_process_best", lambda n, s: 1.0):
        out2 = bench._adjudicate_flagged(timings2, clean2, [], "/x")
    verdicts = [e["verdict"] for e in out2.values()]
    assert verdicts.count("unmeasured") == 2
    assert verdicts.count("host_drift") == bench.MAX_ADJUDICATIONS

    # a failed re-measure is unmeasured, never a verdict
    with mock.patch.object(bench, "_fresh_process_best", lambda n, s: None):
        out3 = bench._adjudicate_flagged(
            {"a": 15.0, **flat}, {"a": 10.0, **flat}, [], "/x"
        )
    assert out3["a"]["verdict"] == "unmeasured"


def test_clean_history_substitutes_host_drift_fresh_reading(
    tmp_path, monkeypatch
):
    rows = [
        {"contaminated": False, "sf": 0.1, "queries": {"a": 15.0, "b": 3.0},
         "flagged": {"a": {"fresh_process": 10.0, "verdict": "host_drift"}}},
        {"contaminated": False, "sf": 0.1, "queries": {"a": 12.0, "b": 3.1},
         "flagged": {"a": {"fresh_process": 11.5, "verdict": "regression"}}},
        {"contaminated": True, "sf": 0.1, "queries": {"a": 99.0}},
        {"contaminated": False, "sf": 0.01, "queries": {"a": 1.0}},
    ]
    with open(tmp_path / "BENCH_LOCAL.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path)
    )
    hist = bench._clean_history(0.1)
    assert len(hist) == 2  # contaminated + wrong-sf rows excluded
    assert hist[0]["a"] == 10.0  # host_drift -> fresh reading substituted
    assert hist[1]["a"] == 12.0  # regression verdict keeps the in-bench time
    assert hist[0]["b"] == 3.0
    assert bench._last_clean_timings(0.1)["a"] == 12.0


def test_diffuse_drift_detection_and_baseline_exclusion(
    tmp_path, monkeypatch
):
    """When the whole timing distribution shifts (median ratio above
    DIFFUSE_MEDIAN_RATIO), fresh-process re-measures read the same slow
    host — every flagged query must get 'diffuse_host_drift' with NO
    re-measure, and such a run must never become a future baseline."""
    timings = {f"q{i}": 13.0 for i in range(10)}
    clean = {n: 10.0 for n in timings}  # every ratio 1.3 -> median 1.3

    def boom(name, sf_dir):
        raise AssertionError("re-measure attempted under diffuse drift")

    with mock.patch.object(bench, "_fresh_process_best", boom):
        out = bench._adjudicate_flagged(timings, clean, [], "/x")
    assert len(out) == 10
    assert all(e["verdict"] == "diffuse_host_drift" for e in out.values())
    assert all(e["fresh_process"] is None for e in out.values())

    # one slow outlier over a flat field is NOT diffuse — it re-measures
    timings2 = {f"q{i}": 10.0 for i in range(9)}
    timings2["hot"] = 30.0
    clean2 = {n: 10.0 for n in timings2}
    with mock.patch.object(bench, "_fresh_process_best", lambda n, s: 10.0):
        out2 = bench._adjudicate_flagged(timings2, clean2, [], "/x")
    assert set(out2) == {"hot"} and out2["hot"]["verdict"] == "host_drift"

    # a diffuse-drift row is excluded from history baselines
    rows = [
        {"contaminated": False, "sf": 0.1, "queries": {"a": 10.0}},
        {"contaminated": False, "sf": 0.1, "queries": {"a": 13.0},
         "diffuse_drift": True},
    ]
    with open(tmp_path / "BENCH_LOCAL.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    assert bench._last_clean_timings(0.1) == {"a": 10.0}
