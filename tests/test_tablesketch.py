"""Table-level sketch maintenance (tablesketch.py): the facade's
answers equal a fresh whole-table sketch BIT-FOR-BIT after any sequence
of merges — the per-file decomposition is exact, not approximate-on-top-
of-approximate — and maintenance is incremental (the sidecar only gains
rows for files a merge actually wrote)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.api import Engine
from airflow_postgres_etl_spark.operators import sketch as SK
from airflow_postgres_etl_spark.tablesketch import SKETCH_SUBDIR


def _table(spark, tmp_path, rows):
    t = Engine(spark).table(str(tmp_path / "t"))
    t.merge(
        spark.createDataFrame(rows, "oid__id string, v long, tag string"),
        num_buckets=4,
    )
    return t


def _rows(n, start=0, tag="a"):
    return [(f"k{i}", i * 7 % 97, tag if i % 3 else "b") for i in range(start, start + n)]


def _fresh_kmv_est(t, col, k=SK.DEFAULT_K):
    df = t.read().withColumn("__g", F.lit(1))
    sk = SK.kmv_sketch(df, ["__g"], F.col(col).cast("string"), k=k)
    return sk.select(SK.kmv_estimate_expr(k).alias("e")).collect()[0].e


def test_sketch_equals_whole_table_after_two_merges(spark, tmp_path):
    t = _table(spark, tmp_path, _rows(300))
    t.merge(
        spark.createDataFrame(
            _rows(100, start=250, tag="c"), "oid__id string, v long, tag string"
        ),
        num_buckets=4,
    )
    got = {r.column: r.distinct_est for r in t.sketch(["oid__id", "v", "tag"]).collect()}
    for col in ("oid__id", "v", "tag"):
        assert got[col] == _fresh_kmv_est(t, col), col
    # exact below the fill line: 97 distinct v values, 3 tags
    assert got["v"] == 97.0 and got["tag"] == 3.0


def test_sidecar_grows_only_by_rewritten_files(spark, tmp_path):
    t = _table(spark, tmp_path, _rows(300))
    t.sketch(["v"])  # builds sidecar for all live files
    side = os.path.join(t.path, SKETCH_SUBDIR, f"kmv{SK.DEFAULT_K}_v")
    covered_1 = {
        r[0] for r in spark.read.parquet(side).select("__sk_file").distinct().collect()
    }
    live_1 = set(t.read().inputFiles())
    assert len(covered_1) == len(live_1)

    # a one-key merge touches ONE bucket; the next sketch call must add
    # sidecar rows only for that bucket's rewritten files
    t.merge(
        spark.createDataFrame([("k1", 999, "z")], "oid__id string, v long, tag string"),
        num_buckets=4,
    )
    assert t.sketch(["v"]).collect()[0].distinct_est == _fresh_kmv_est(t, "v")
    covered_2 = {
        r[0] for r in spark.read.parquet(side).select("__sk_file").distinct().collect()
    }
    new = covered_2 - covered_1
    # untouched buckets' files were NOT re-sketched (they're still covered)
    assert covered_1 < covered_2
    # only files from a single new commit dir were added
    assert len({f.split("/")[1] for f in new}) == 1


def test_sketch_resolves_mor_dirty_buckets(spark, tmp_path):
    """Pending deltas supersede base rows — the facade must sketch the
    VISIBLE rows, not the union of base+delta files."""
    t = _table(spark, tmp_path, _rows(50))
    t.merge_mor(
        spark.createDataFrame(
            [(f"k{i}", 1000, "m") for i in range(10)],
            "oid__id string, v long, tag string",
        ),
        num_buckets=4,
    )
    assert t.delta_depth() >= 1
    got = {r.column: r.distinct_est for r in t.sketch(["v"]).collect()}
    assert got["v"] == _fresh_kmv_est(t, "v")
    # after compaction (deltas folded) the answer is unchanged
    t.compact()
    got2 = {r.column: r.distinct_est for r in t.sketch(["v"]).collect()}
    assert got2["v"] == got["v"]


def test_frequencies_equal_whole_table_cms(spark, tmp_path):
    t = _table(spark, tmp_path, _rows(300))
    t.merge(
        spark.createDataFrame(
            _rows(100, start=250), "oid__id string, v long, tag string"
        ),
        num_buckets=4,
    )
    probes = ["a", "b", "zzz"]
    got = {r.item: r.est_cnt for r in t.frequencies("tag", probes).collect()}
    fresh = SK.cms_sketch(t.read(), [], F.col("tag").cast("string"))
    want = {
        r.item: r.est_cnt
        for r in SK.cms_lookup(
            fresh,
            spark.createDataFrame([(p,) for p in probes], ["item"]),
            "item",
        ).collect()
    }
    assert got == want
    # CMS never under-counts; absent probe is 0 unless collided
    true_a = t.read().filter(F.col("tag") == "a").count()
    assert got["a"] >= true_a and got["zzz"] >= 0


def test_quantiles_equal_whole_table_bottomk(spark, tmp_path):
    t = _table(spark, tmp_path, _rows(300))
    t.merge(
        spark.createDataFrame(
            _rows(120, start=240), "oid__id string, v long, tag string"
        ),
        num_buckets=4,
    )
    qs = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
    got = t.quantiles("v", qs).collect()[0]
    # fresh whole-table sample, same row identity
    df = t.read().withColumn("__g", F.lit(1))
    row_key = F.concat_ws("\x1f", F.col("oid__id"), F.col("v").cast("string"))
    sample = SK.bottomk_sample(df, ["__g"], row_key, k=256).select(
        "__g", "__h", F.col("v").alias("v")
    )
    want = SK.sample_quantiles(sample, ["__g"], "v", qs, "__h").collect()[0]
    assert (got.n_sample, got.p50, got.p90, got.p99) == (
        want.n_sample,
        want.p50,
        want.p90,
        want.p99,
    )


def test_vacuum_spares_sketch_sidecar(spark, tmp_path):
    t = _table(spark, tmp_path, _rows(100))
    t.sketch(["v"])
    assert t.vacuum(retention_s=0) >= 0
    side = os.path.join(t.path, SKETCH_SUBDIR, f"kmv{SK.DEFAULT_K}_v")
    assert spark.read.parquet(side).count() > 0


def test_table_sketches_follow_column_rename(spark, tmp_path):
    """Facades name LOGICAL columns; sidecars are keyed by physical
    names, so a metadata-only rename keeps the cached per-file sketches
    valid — same estimates before and after, under the new name; a
    dropped column refuses loudly."""
    import pytest as _pytest

    from airflow_postgres_etl_spark.sink import (
        drop_column,
        keyed_overwrite_parquet,
        rename_column,
    )
    from airflow_postgres_etl_spark.tablesketch import (
        table_frequencies,
        table_kmv_distinct,
    )

    t = str(tmp_path / "t")
    rows = spark.createDataFrame(
        [(f"k{i}", f"v{i % 11}", f"w{i % 5}") for i in range(60)],
        ["oid__id", "val", "aux"],
    )
    keyed_overwrite_parquet(spark, rows, t, num_buckets=2, vacuum=False)
    before = table_kmv_distinct(spark, t, ["val"]).collect()[0]
    rename_column(spark, t, "val", "value")
    after = table_kmv_distinct(spark, t, ["value"]).collect()[0]
    assert after.distinct_est == before.distinct_est
    assert after.column == "value"
    est = {
        r.item: r.est_cnt
        for r in table_frequencies(spark, t, "value", ["v1", "v9"]).collect()
    }
    assert est["v1"] > 0 and est["v9"] > 0
    drop_column(spark, t, "aux")
    with _pytest.raises(ValueError, match="dropped"):
        table_kmv_distinct(spark, t, ["aux"])
