"""Write-Audit-Publish (`sink.wap_begin`/`wap_publish`, `Table.branch`/
`publish`): stage commits on a shallow-clone branch, audit with
expectation rules, fast-forward the source with one CAS.

Safety properties under test: main-table readers never observe
unaudited data; a failed audit or a concurrent source commit leaves the
source byte-identical; the source's vacuum never eats branch files; a
published snapshot survives the branch's re-owning optimize.
"""

from __future__ import annotations

import glob
import os

import pytest

from airflow_postgres_etl_spark import sink
from airflow_postgres_etl_spark.api import Engine
from airflow_postgres_etl_spark.operators.expectations import expect
from airflow_postgres_etl_spark.storage import ConcurrentWriteError


def _table(spark, tmp_path, rows):
    t = Engine(spark).table(str(tmp_path / "t"))
    t.merge(
        spark.createDataFrame(rows, "k string, v long"),
        key="k", num_buckets=4, vacuum=False,
    )
    return t


def _state(t) -> dict:
    return {r["k"]: r["v"] for r in t.read().collect()}


def test_branch_publish_roundtrip(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", 1), ("b", 2)])
    b = t.branch("load1")
    b.merge(spark.createDataFrame([("b", 20), ("c", 3)], "k string, v long"), key="k")

    # unpublished: main table still shows the pre-branch state
    assert _state(t) == {"a": 1, "b": 2}
    assert _state(b) == {"a": 1, "b": 20, "c": 3}
    assert t.branches() == ["load1"]

    res = t.publish("load1")
    assert _state(t) == {"a": 1, "b": 20, "c": 3}
    assert res["version"] == t.version() == 2
    ops = [h["operation"] for h in t.history_detail()]
    assert "wap_publish" in ops


def test_failed_audit_leaves_source_untouched(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", 1)])
    b = t.branch("bad")
    b.merge(spark.createDataFrame([("z", -5)], "k string, v long"), key="k")
    v0 = t.version()
    with pytest.raises(ValueError, match="audit failed.*v_nonneg"):
        t.publish("bad", expectations=[expect("v_nonneg", "v >= 0")])
    assert t.version() == v0 and _state(t) == {"a": 1}

    # audit passes once the branch is repaired -> report comes back clean
    b.merge(spark.createDataFrame([("z", 5)], "k string, v long"), key="k")
    res = t.publish("bad", expectations=[expect("v_nonneg", "v >= 0")])
    assert res["report"][0]["n_violations"] == 0
    assert _state(t)["z"] == 5


def test_concurrent_source_commit_fails_publish(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", 1)])
    b = t.branch("race")
    b.merge(spark.createDataFrame([("b", 2)], "k string, v long"), key="k")
    # source moves on while the branch is open
    t.merge(spark.createDataFrame([("c", 3)], "k string, v long"), key="k")
    with pytest.raises(ConcurrentWriteError, match="re-branch"):
        t.publish("race")
    assert _state(t) == {"a": 1, "c": 3}


def test_empty_branch_refuses_publish(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", 1)])
    t.branch("idle")
    with pytest.raises(ValueError, match="nothing to publish"):
        t.publish("idle")


def test_abandon_unpublished_only(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", 1)])
    b = t.branch("scratch")
    b.merge(spark.createDataFrame([("b", 2)], "k string, v long"), key="k")
    t.abandon("scratch")
    assert t.branches() == []
    assert _state(t) == {"a": 1}

    b2 = t.branch("keep")
    b2.merge(spark.createDataFrame([("b", 2)], "k string, v long"), key="k")
    t.publish("keep")
    with pytest.raises(ValueError, match="published"):
        t.abandon("keep")
    assert _state(t) == {"a": 1, "b": 2}


def test_vacuum_ownership_across_publish(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", 1), ("b", 2)])
    b = t.branch("v")
    b.merge(spark.createDataFrame([("a", 10)], "k string, v long"), key="k")
    t.publish("v")

    # aggressive source vacuum: may collect the retired pre-publish
    # bucket file, must NEVER touch the branch subtree the published
    # manifest references
    branch_files = set(
        glob.glob(str(tmp_path / "t" / "_branches" / "**" / "*.parquet"),
                  recursive=True)
    )
    assert branch_files
    sink.vacuum_keyed_table(str(tmp_path / "t"), retention_s=0)
    assert branch_files == set(
        glob.glob(str(tmp_path / "t" / "_branches" / "**" / "*.parquet"),
                  recursive=True)
    )
    assert _state(t) == {"a": 10, "b": 2}


def test_adopt_reowns_then_branch_removable(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", 1), ("b", 2)])
    b = t.branch("load")
    b.merge(spark.createDataFrame([("c", 3)], "k string, v long"), key="k")
    b.merge_mor(spark.createDataFrame([("b", 20)], "k string, v long"), key="k")
    t.publish("load")
    # adoption copies ONLY the foreign refs (base + MOR delta), then the
    # branch directory can disappear; a second adopt is a no-op
    n = t.adopt_foreign()
    assert n > 0
    assert t.adopt_foreign() == 0
    import shutil

    shutil.rmtree(tmp_path / "t" / "_branches")
    assert _state(t) == {"a": 1, "b": 20, "c": 3}
    ops = [h["operation"] for h in t.history_detail()]
    assert "adopt_foreign" in ops
    # no reference escapes the table directory anymore
    m = sink._load_manifest(str(tmp_path / "t"))
    refs = [f for fs in m["buckets"].values() for f in fs]
    refs += [e["path"] for es in m.get("deltas", {}).values() for e in es]
    assert all(not os.path.isabs(f) for f in refs)


def test_layout_divergence_refused(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", 1), ("b", 2)])
    b = t.branch("rb")
    sink.rebucket_keyed_table(spark, b.path, 2)
    with pytest.raises(ValueError, match="bucket layout"):
        t.publish("rb")


def test_mor_seq_safety_after_publish(spark, tmp_path):
    """Branch MOR commits push its version past base+1; publish
    fast-forwards the source to the BRANCH's version so the source's
    next delta seq stays above every published one."""
    t = _table(spark, tmp_path, [("a", 1)])
    b = t.branch("m")
    b.merge_mor(spark.createDataFrame([("a", 2)], "k string, v long"), key="k")
    b.merge_mor(spark.createDataFrame([("a", 3)], "k string, v long"), key="k")
    res = t.publish("m")
    assert res["version"] == 3 and t.version() == 3
    # a post-publish MOR merge on the source must win precedence
    t.merge_mor(spark.createDataFrame([("a", 4)], "k string, v long"), key="k")
    assert _state(t) == {"a": 4}


def test_branch_name_traversal_rejected(tmp_path):
    """'.'/'..' (and any non-allowlisted name) must never resolve a
    branch path into the source table itself: os.path.join(src,
    '_branches', '..') normalizes to src, so a clone/delete aimed there
    would hit the SOURCE (r7 advisor finding)."""
    import pytest as _pytest

    from airflow_postgres_etl_spark import sink as sink_mod

    src = str(tmp_path / "t")
    for bad in ("..", ".", "../x", "a/b", "_hidden", "", "a b", "a\nb"):
        with _pytest.raises(ValueError, match="invalid branch name"):
            sink_mod._branch_path(src, bad)
    # normal names still resolve under the branch subtree
    for ok in ("audit-2026", "r8.main", "B_1"):
        p = sink_mod._branch_path(src, ok)
        assert p.startswith(src + "/") and "_branches" in p
