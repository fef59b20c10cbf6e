"""Bloom-filter file skipping: point predicates must open only files
whose bloom admits the value, results must equal read-then-filter
exactly, and staleness (unindexed new files, MOR deltas) must degrade
pruning — never correctness."""

from __future__ import annotations

import pytest

from airflow_postgres_etl_spark.bloom import add_bloom_index
from airflow_postgres_etl_spark.sink import (
    keyed_merge_mor,
    keyed_overwrite_parquet,
    read_keyed_table,
)


def _make_table(spark, target, n=400, buckets=8):
    # tag value identifies the row group: high cardinality, each value
    # in exactly one row -> worst case for min/max, best case for blooms
    rows = [(f"k{i}", f"tag{i}", i) for i in range(n)]
    batch = spark.createDataFrame(rows, ["oid__id", "tag", "v"])
    keyed_overwrite_parquet(spark, batch, target, num_buckets=buckets, vacuum=False)
    return rows


def test_bloom_prunes_point_queries(spark, tmp_path):
    target = str(tmp_path / "t")
    _make_table(spark, target)
    n_indexed = add_bloom_index(spark, target, "tag")
    assert n_indexed == 8  # one file per bucket

    full = read_keyed_table(spark, target)
    n_files = len(full.inputFiles())

    hit = read_keyed_table(spark, target, where_eq=("tag", "tag123"))
    assert [(r.oid__id, r.v) for r in hit.collect()] == [("k123", 123)]
    # a single tag lives in ONE bucket; blooms should open ~1 file
    # (false positives allowed, but far below the full file count)
    assert len(hit.inputFiles()) < n_files / 2

    # absent value: empty result, right schema, minimal files
    miss = read_keyed_table(spark, target, where_eq=("tag", "no-such-tag"))
    assert miss.count() == 0
    assert set(miss.columns) == {"oid__id", "tag", "v"}
    assert len(miss.inputFiles()) <= max(1, n_files // 2)


def test_unindexed_new_files_always_read(spark, tmp_path):
    """A merge after indexing writes files with no bloom — they MUST be
    read (stale index can hide nothing)."""
    target = str(tmp_path / "t")
    _make_table(spark, target)
    add_bloom_index(spark, target, "tag")
    fresh = spark.createDataFrame(
        [("k9999", "brand-new-tag", 9999)], ["oid__id", "tag", "v"]
    )
    keyed_overwrite_parquet(spark, fresh, target, num_buckets=8, vacuum=False)
    got = read_keyed_table(spark, target, where_eq=("tag", "brand-new-tag"))
    assert [(r.oid__id, r.v) for r in got.collect()] == [("k9999", 9999)]
    # blooms of UNTOUCHED files survive the merge (carried like stats):
    # a probe for an old tag still prunes to far fewer than all files
    n_all = len(read_keyed_table(spark, target).inputFiles())
    old_hit = read_keyed_table(spark, target, where_eq=("tag", "tag123"))
    assert [r.oid__id for r in old_hit.collect()] == ["k123"]
    assert len(old_hit.inputFiles()) < n_all / 2
    # re-indexing restores pruning AND converges under the CAS
    add_bloom_index(spark, target, "tag")
    again = read_keyed_table(spark, target, where_eq=("tag", "brand-new-tag"))
    assert [(r.oid__id, r.v) for r in again.collect()] == [("k9999", 9999)]


def test_bloom_composes_with_range_skipping_and_mor(spark, tmp_path):
    target = str(tmp_path / "t")
    _make_table(spark, target)
    add_bloom_index(spark, target, "tag")
    # MOR delta replaces k5's tag: the dirty bucket is bloom-exempt, so
    # the OLD tag must not resurface and the NEW one must be found
    keyed_merge_mor(
        spark,
        spark.createDataFrame([("k5", "replaced", -5)], ["oid__id", "tag", "v"]),
        target,
        num_buckets=8,
    )
    old = read_keyed_table(spark, target, where_eq=("tag", "tag5"))
    assert old.count() == 0
    new = read_keyed_table(spark, target, where_eq=("tag", "replaced"))
    assert [(r.oid__id, r.v) for r in new.collect()] == [("k5", -5)]
    # composition with a range predicate (AND semantics)
    both = read_keyed_table(
        spark, target, where=("v", 100, 200), where_eq=("tag", "tag123")
    )
    assert [(r.oid__id,) for r in both.select("oid__id").collect()] == [("k123",)]
    none = read_keyed_table(
        spark, target, where=("v", 0, 50), where_eq=("tag", "tag123")
    )
    assert none.count() == 0


def test_where_eq_rejects_null_probe(spark, tmp_path):
    target = str(tmp_path / "t")
    _make_table(spark, target, n=10)
    with pytest.raises(ValueError, match="must not be None"):
        read_keyed_table(spark, target, where_eq=("tag", None))
