"""Type-level schema evolution on the keyed table: implicit lossless
upcasts of narrow batches, loud write-time rejection of conflicts (which
previously surfaced as a cryptic parquet mergeSchema failure at READ
time), and widen_keyed_table for the table-side move."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airflow_postgres_etl_spark.sink import (
    keyed_merge_mor,
    keyed_overwrite_parquet,
    lookup_keys,
    read_keyed_table,
    table_delta_depth,
    table_version,
    widen_keyed_table,
)


def _df(spark, rows, v_type=LongType(), key_type=StringType()):
    schema = StructType(
        [StructField("oid__id", key_type), StructField("v", v_type)]
    )
    return spark.createDataFrame(rows, schema)


def test_narrow_batch_upcasts_into_wide_table(spark, tmp_path):
    """int batch into a bigint column: implicit lossless upcast, for
    both the CoW and MOR write paths; schema stays bigint."""
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark, _df(spark, [("a", 1), ("b", 2)]), target, num_buckets=2
    )
    narrow = _df(spark, [("a", 10)], v_type=IntegerType())
    keyed_overwrite_parquet(spark, narrow, target, num_buckets=2)
    keyed_merge_mor(
        spark, _df(spark, [("c", 3)], v_type=IntegerType()), target, num_buckets=2
    )
    df = read_keyed_table(spark, target)
    assert dict(df.dtypes)["v"] == "bigint"
    assert {(r.oid__id, r.v) for r in df.collect()} == {
        ("a", 10),
        ("b", 2),
        ("c", 3),
    }


def test_wide_batch_rejected_pointing_at_widen(spark, tmp_path):
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark,
        _df(spark, [("a", 1)], v_type=IntegerType()),
        target,
        num_buckets=2,
    )
    with pytest.raises(ValueError, match="widen_keyed_table"):
        keyed_overwrite_parquet(
            spark, _df(spark, [("b", 2)]), target, num_buckets=2
        )
    with pytest.raises(ValueError, match="widen_keyed_table"):
        keyed_merge_mor(spark, _df(spark, [("b", 2)]), target, num_buckets=2)


def test_incompatible_type_rejected_loudly(spark, tmp_path):
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark, _df(spark, [("a", 1)]), target, num_buckets=2
    )
    bad = spark.createDataFrame([("b", "oops")], ["oid__id", "v"])
    with pytest.raises(ValueError, match="no lossless conversion"):
        keyed_overwrite_parquet(spark, bad, target, num_buckets=2)
    assert table_version(target) == 1  # nothing committed


def test_drifted_batch_into_untouched_buckets_still_aligned(spark, tmp_path):
    """The reconciliation edge: a narrow batch whose keys hash to
    buckets with NO existing files must still upcast (otherwise the
    drifted file poisons a later full-table mergeSchema read)."""
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark, _df(spark, [("a", 1)]), target, num_buckets=16
    )
    wide = _df(
        spark, [(f"k{i}", i) for i in range(30)], v_type=IntegerType()
    )
    keyed_overwrite_parquet(spark, wide, target, num_buckets=16)
    df = read_keyed_table(spark, target)  # would raise on footer conflict
    assert dict(df.dtypes)["v"] == "bigint"
    assert df.count() == 31


def test_widen_keyed_table_value_column(spark, tmp_path):
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark,
        _df(spark, [("a", 1), ("b", 2)], v_type=IntegerType()),
        target,
        num_buckets=2,
        stats_cols=["v"],
    )
    before = {(r.oid__id, r.v) for r in read_keyed_table(spark, target).collect()}
    widen_keyed_table(spark, target, {"v": "bigint"})
    df = read_keyed_table(spark, target)
    assert dict(df.dtypes)["v"] == "bigint"
    assert {(r.oid__id, r.v) for r in df.collect()} == before
    # the wide batch now merges fine
    keyed_overwrite_parquet(spark, _df(spark, [("c", 2**40)]), target, num_buckets=2)
    assert read_keyed_table(spark, target).filter("v > 1000000").count() == 1
    # data-skipping stats survived the rewrite (recomputed for 'v')
    got = read_keyed_table(spark, target, where=("v", 2**40, None))
    assert {r.oid__id for r in got.collect()} == {"c"}


def test_widen_key_column_rehashes_buckets(spark, tmp_path):
    """Widening the KEY changes its xxhash64 — the rewrite must re-route
    every row into its new-bucket home or pruned reads go blind."""
    target = str(tmp_path / "t")
    df = _df(
        spark,
        [(i, i * 10) for i in range(20)],
        v_type=LongType(),
        key_type=IntegerType(),
    )
    keyed_overwrite_parquet(spark, df, target, num_buckets=8)
    widen_keyed_table(spark, target, {"oid__id": "bigint"})
    out = read_keyed_table(spark, target)
    assert dict(out.dtypes)["oid__id"] == "bigint"
    assert out.count() == 20
    # bucket-pruned point lookup (hashes with the NEW type) still finds keys
    assert {r.oid__id for r in lookup_keys(spark, target, [3, 7]).collect()} == {3, 7}
    # and a bigint-keyed merge lands in the right buckets
    big = _df(spark, [(3, 999)], v_type=LongType(), key_type=LongType())
    keyed_overwrite_parquet(spark, big, target, num_buckets=8)
    assert {
        r.v for r in lookup_keys(spark, target, [3]).collect()
    } == {999}


def test_widen_resolves_pending_deltas(spark, tmp_path):
    """A widen over a dirty table folds MOR deltas (it's a full rewrite)
    and keeps precedence-resolved content."""
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark,
        _df(spark, [("a", 1), ("b", 2)], v_type=IntegerType()),
        target,
        num_buckets=2,
    )
    keyed_merge_mor(
        spark,
        _df(spark, [("a", 7)], v_type=IntegerType()),
        target,
        num_buckets=2,
    )
    assert table_delta_depth(target) == 1
    widen_keyed_table(spark, target, {"v": "bigint"})
    assert table_delta_depth(target) == 0
    assert {
        (r.oid__id, r.v) for r in read_keyed_table(spark, target).collect()
    } == {("a", 7), ("b", 2)}


def test_widen_rejects_non_lossless(spark, tmp_path):
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(spark, _df(spark, [("a", 1)]), target, num_buckets=2)
    with pytest.raises(ValueError, match="not a lossless"):
        widen_keyed_table(spark, target, {"v": "int"})  # narrowing
    with pytest.raises(ValueError, match="no column"):
        widen_keyed_table(spark, target, {"nope": "bigint"})


def test_nullability_only_difference_is_not_a_type_conflict(spark, tmp_path):
    """collect_list yields array<bigint> containsNull=false; the same
    column read back from parquet is containsNull=true.  A re-merge of
    a derived batch must treat that as the SAME type (metadata-only
    cast), not "no lossless conversion"."""
    from pyspark.sql import functions as F

    from airflow_postgres_etl_spark.sink import (
        keyed_overwrite_parquet,
        read_keyed_table,
    )

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3])], "oid__id string, xs array<bigint>"
    )
    keyed_overwrite_parquet(spark, base, target, num_buckets=2)
    # batch built by an aggregate: containsNull=false flavor
    batch = (
        spark.createDataFrame([("a", 9), ("a", 8)], "oid__id string, v long")
        .groupBy("oid__id")
        .agg(F.sort_array(F.collect_list("v")).alias("xs"))
    )
    assert not batch.schema["xs"].dataType.containsNull
    keyed_overwrite_parquet(spark, batch, target, num_buckets=2)
    got = {(r.oid__id, tuple(r.xs)) for r in read_keyed_table(spark, target).collect()}
    assert got == {("a", (8, 9)), ("b", (3,))}
