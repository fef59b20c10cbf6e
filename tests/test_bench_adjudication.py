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

def test_emit_lines_final_line_fits_with_all_queries_flagged():
    """BENCH_r10.json regression (VERDICT r10 item 1): with 156 queries
    ALL flagged, every emitted line — and especially the FINAL one the
    driver parses — must stay under the 2000-char stdout tail, and the
    final line must round-trip through json.loads with the headline
    fields present."""
    names = [f"pipeline_query_variant_number_{i:03d}" for i in range(156)]
    q_ms = {bench._abbrev(n): 1000 + i for i, n in enumerate(names)}
    flagged = {
        bench._abbrev(n): {
            "in_bench": 2.0, "last_clean": 1.0, "band": [1.0, 1.1],
            "fresh_process": None, "verdict": "unmeasured",
        }
        for n in names
    }
    compact = {
        "metric": "headline_queries_total",
        "value": 123.456,
        "unit": "sec",
        "sf": 0.1,
        "n": len(q_ms),
        "load1": 1.0,
        "contaminated": False,
        "queries": dict(q_ms),
        "flagged": {k: e["verdict"] for k, e in flagged.items()},
    }
    lines = bench._emit_lines(compact, q_ms, flagged)
    assert all(len(ln) <= bench.MAX_LINE for ln in lines)
    final = json.loads(lines[-1])
    assert final["value"] == 123.456
    assert final["n"] == 156
    assert final["contaminated"] is False
    # flagged collapsed to verdict counts, not the 156-entry map
    assert final["flagged"] == {"unmeasured": 156}
    # no query timing lost: earlier lines + final line cover all 156
    seen = dict(final["queries"])
    for ln in lines[:-1]:
        seen.update(json.loads(ln).get("queries_fast", {}))
    assert seen == q_ms

    # the short path stays a single untouched line
    small = {"metric": "m", "value": 1.0, "n": 2, "contaminated": False,
             "queries": {"a": 1, "b": 2}}
    lines2 = bench._emit_lines(dict(small), {"a": 1, "b": 2}, {})
    assert len(lines2) == 1 and json.loads(lines2[0])["n"] == 2


def test_adjudication_cap_spends_slots_on_worst_ratios():
    """VERDICT r10 item 2: the 8-slot cap must re-measure the WORST
    in_bench/last_clean ratios first, not the first 8 alphabetically."""
    n = bench.MAX_ADJUDICATIONS
    # flat filler keeps median at 1.0 and flag fraction under the
    # diffuse trigger: 12 flagged / 112 comparable ~= 0.107
    flat = {f"zz{i}": 1.0 for i in range(100)}
    # names sort alphabetically OPPOSITE to severity: a00 is mildest
    timings = {f"a{i:02d}": 10.0 * (1.21 + 0.01 * i) for i in range(12)}
    clean = {k: 10.0 for k in timings}
    timings.update(flat)
    clean.update(flat)
    with mock.patch.object(bench, "_fresh_process_best", lambda n_, s: 10.0):
        out = bench._adjudicate_flagged(timings, clean, [], "/x")
    measured = {k for k, e in out.items() if e["verdict"] == "host_drift"}
    stranded = {k for k, e in out.items() if e["verdict"] == "unmeasured"}
    # worst n ratios (highest indices) got the fresh-process slots
    assert measured == {f"a{i:02d}" for i in range(12 - n, 12)}
    assert stranded == {f"a{i:02d}" for i in range(12 - n)}


def test_flag_fraction_triggers_diffuse_below_median_line():
    """VERDICT r10 item 3: median 1.14 (under the 1.15 line) but >25%
    of comparable queries flagged -> the run is diffuse host drift; no
    fresh-process re-measures, nothing stranded as 'unmeasured'."""
    # 40 comparable: 24 at ratio 1.0, 16 at ratio 1.3 -> median 1.0,
    # flag fraction 0.4 > 0.25
    timings = {f"ok{i}": 1.0 for i in range(24)}
    timings.update({f"hot{i}": 13.0 for i in range(16)})
    clean = {k: (1.0 if k.startswith("ok") else 10.0) for k in timings}

    def boom(name, sf_dir):
        raise AssertionError("re-measure attempted under diffuse drift")

    with mock.patch.object(bench, "_fresh_process_best", boom):
        out = bench._adjudicate_flagged(timings, clean, [], "/x")
    assert len(out) == 16
    assert all(e["verdict"] == "diffuse_host_drift" for e in out.values())

    med, flagged, diffuse = bench._run_drift_signal(timings, clean)
    assert diffuse is True
    # and main()'s artifact field comes from the same helper, so the
    # run-level flag agrees with the per-query verdicts by construction
    assert set(flagged) == {f"hot{i}" for i in range(16)}

def test_emit_lines_cap_holds_for_arbitrary_shapes():
    """Property: whatever the query-name lengths, counts, and flag
    population, every emitted line obeys MAX_LINE, the final line
    json-parses with the headline fields, and no timing is lost."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=400),
        name_len=st.integers(min_value=3, max_value=40),
        flag_every=st.integers(min_value=1, max_value=5),
    )
    def check(n, name_len, flag_every):
        q_ms = {
            ("q" * name_len) + str(i): 1000 + i for i in range(n)
        }
        flagged = {
            k: {"verdict": "unmeasured"}
            for i, k in enumerate(q_ms) if i % flag_every == 0
        }
        compact = {
            "metric": "headline_queries_total", "value": 1.0,
            "unit": "sec", "sf": 0.1, "n": n, "load1": 0.5,
            "contaminated": False, "queries": dict(q_ms),
        }
        if flagged:
            compact["flagged"] = {k: "unmeasured" for k in flagged}
        lines = bench._emit_lines(compact, q_ms, flagged)
        assert all(len(ln) <= bench.MAX_LINE for ln in lines)
        final = json.loads(lines[-1])
        assert final["n"] == n and final["contaminated"] is False
        seen = dict(final["queries"])
        for ln in lines[:-1]:
            seen.update(json.loads(ln).get("queries_fast", {}))
        assert seen == q_ms

    check()


def test_zero_baseline_timing_neither_flags_nor_crashes():
    """r11 review: a sub-ms query rounds to 0.0 in the clean history;
    admitting it to the flagged set would divide by zero in the
    severity sort (crashing main() before the bench artifact is
    emitted) and let flagged membership disagree with n_comparable.
    Zero-baseline queries are simply not comparable."""
    timings = {"fast": 0.004, "slow": 2.0, "steady": 1.0}
    clean = {"fast": 0.0, "slow": 1.0, "steady": 1.0}
    med, flagged, diffuse = bench._run_drift_signal(timings, clean)
    assert flagged == ["slow"]  # 'fast' excluded, no ZeroDivisionError
    assert med is not None
    out = bench._adjudicate_flagged(
        timings, clean, [], "/nonexistent-sf-dir"
    )
    assert "fast" not in out


def test_emit_lines_jobs_spill_in_tandem_with_timings():
    """r12 (VERDICT r11 task 3): per-query Spark-job counts ride the
    compact stdout lines.  Every line obeys MAX_LINE, the final line
    json-parses with jobs_total and a jobs map for exactly the queries
    it carries, and the union of (queries, jobs) across all lines
    reconstructs both full maps — each name's ms and job count always
    share a line."""
    names = [f"pipeline_query_variant_number_{i:03d}" for i in range(156)]
    q_ms = {bench._abbrev(n): 1000 + i for i, n in enumerate(names)}
    q_jobs = {bench._abbrev(n): 3 + (i % 40) for i, n in enumerate(names)}
    compact = {
        "metric": "headline_queries_total",
        "value": 123.456,
        "unit": "sec",
        "sf": 0.1,
        "n": len(q_ms),
        "load1": 1.0,
        "contaminated": False,
        "queries": dict(q_ms),
        "jobs": dict(q_jobs),
        "jobs_total": sum(q_jobs.values()),
    }
    lines = bench._emit_lines(compact, q_ms, flagged={}, q_jobs=q_jobs)
    assert all(len(ln) <= bench.MAX_LINE for ln in lines)
    final = json.loads(lines[-1])
    assert final["jobs_total"] == sum(q_jobs.values())
    # final line: jobs cover exactly the queries kept on it
    assert set(final["jobs"]) == set(final["queries"])
    seen_ms, seen_jobs = dict(final["queries"]), dict(final["jobs"])
    for ln in lines[:-1]:
        row = json.loads(ln)
        # tandem rule: a spilled line carries ms and jobs for the SAME keys
        assert set(row.get("jobs_fast", {})) == set(row.get("queries_fast", {}))
        seen_ms.update(row.get("queries_fast", {}))
        seen_jobs.update(row.get("jobs_fast", {}))
    assert seen_ms == q_ms
    assert seen_jobs == q_jobs

    # without q_jobs the legacy 3-arg shape is unchanged (single line
    # when it fits, no jobs keys invented)
    small = {"metric": "m", "value": 1.0, "n": 2, "contaminated": False,
             "queries": {"a": 1, "b": 2}}
    lines2 = bench._emit_lines(dict(small), {"a": 1, "b": 2}, {})
    assert len(lines2) == 1 and "jobs" not in json.loads(lines2[0])
