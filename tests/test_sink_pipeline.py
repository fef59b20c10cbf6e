"""Tests for the keyed-overwrite sink and the incremental pipeline:
replace-by-key semantics, idempotent re-runs, HWM incremental filtering,
failure-ordering, and the generated merge SQL (reference S6-S9)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from airflow_postgres_etl_spark.pipeline import (
    incremental_load,
    parquet_high_water_mark,
)
from airflow_postgres_etl_spark.sink import (
    BUCKET_COL,
    create_table_sql,
    high_water_mark_sql,
    keyed_overwrite_parquet,
    merge_sql,
    read_keyed_table,
)

from .fixtures.gen_raw import generate


def test_keyed_overwrite_replaces_all_rows_per_key(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("k1", 1), ("k1", 2), ("k2", 3)], ["oid__id", "v"]
    )
    keyed_overwrite_parquet(spark, base, target)
    # k1 arrives again with ONE row: both old k1 rows must go (child-set
    # replace), k2 untouched
    batch = spark.createDataFrame([("k1", 9)], ["oid__id", "v"])
    keyed_overwrite_parquet(spark, batch, target)
    got = {(r.oid__id, r.v) for r in spark.read.parquet(target).collect()}
    assert got == {("k1", 9), ("k2", 3)}


def test_keyed_overwrite_idempotent(spark, tmp_path):
    target = str(tmp_path / "t")
    batch = spark.createDataFrame([("a", 1), ("b", 2)], ["oid__id", "v"])
    keyed_overwrite_parquet(spark, batch, target)
    keyed_overwrite_parquet(spark, batch, target)
    assert spark.read.parquet(target).count() == 2


def _bucket_file_state(target):
    """{bucket_dir: {file: (size, mtime_ns, md5)}} snapshot of the target."""
    import hashlib

    state = {}
    for d in os.listdir(target):
        full = os.path.join(target, d)
        if not (os.path.isdir(full) and d.startswith(f"{BUCKET_COL}=")):
            continue
        files = {}
        for f in sorted(os.listdir(full)):
            p = os.path.join(full, f)
            st = os.stat(p)
            files[f] = (
                st.st_size,
                st.st_mtime_ns,
                hashlib.md5(open(p, "rb").read()).hexdigest(),
            )
        state[d] = files
    return state


def test_keyed_overwrite_rewrites_only_affected_buckets(spark, tmp_path):
    """The scale contract: a merge must not touch buckets absent from the
    batch — their files stay byte-identical (same inode mtime, same md5)."""
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(f"key{i}", i) for i in range(200)], ["oid__id", "v"]
    )
    keyed_overwrite_parquet(spark, base, target, num_buckets=8)
    before = _bucket_file_state(target)
    assert len(before) > 1  # keys actually spread over several buckets

    batch = spark.createDataFrame([("key0", 999)], ["oid__id", "v"])
    keyed_overwrite_parquet(spark, batch, target, num_buckets=8)
    after = _bucket_file_state(target)

    from airflow_postgres_etl_spark.sink import _bucket_expr

    hit = f"{BUCKET_COL}=" + str(
        spark.createDataFrame([("key0",)], ["oid__id"])
        .select(_bucket_expr("oid__id", 8).alias("b"))
        .collect()[0][0]
    )
    assert hit in before and hit in after
    for d in before:
        if d == hit:
            assert before[d] != after[d]  # the hit bucket WAS rewritten
        else:
            assert before[d] == after[d]  # untouched buckets byte-identical

    got = {(r.oid__id, r.v) for r in read_keyed_table(spark, target).collect()}
    assert ("key0", 999) in got and ("key0", 0) not in got
    assert len(got) == 200


def test_keyed_overwrite_rejects_bucket_spec_change(spark, tmp_path):
    target = str(tmp_path / "t")
    df = spark.createDataFrame([("a", 1)], ["oid__id", "v"])
    keyed_overwrite_parquet(spark, df, target, num_buckets=8)
    with pytest.raises(ValueError, match="bucket"):
        keyed_overwrite_parquet(spark, df, target, num_buckets=16)


def test_read_keyed_table_hides_bucket_column(spark, tmp_path):
    target = str(tmp_path / "t")
    df = spark.createDataFrame([("a", 1)], ["oid__id", "v"])
    keyed_overwrite_parquet(spark, df, target)
    assert read_keyed_table(spark, target).columns == ["oid__id", "v"]


def test_merge_sql_quotes_reserved_words():
    stmts = merge_sql("events", "events__stage", "oid__id", ["oid__id", "from", "to"])
    assert stmts[0] == (
        'DELETE FROM "events" t USING "events__stage" s '
        'WHERE t."oid__id" = s."oid__id"'
    )
    assert '"from"' in stmts[1] and '"to"' in stmts[1]
    assert create_table_sql("t", {"from": "String", "x": "DateTime"}) == (
        'CREATE TABLE IF NOT EXISTS "t" ("from" TEXT, "x" TIMESTAMP)'
    )
    assert high_water_mark_sql("t") == 'SELECT max("fileName") FROM "t"'


@pytest.fixture()
def staged_dirs(spark, tmp_path):
    csv_dir = str(tmp_path / "csv")
    generate(csv_dir)
    return csv_dir, str(tmp_path / "tracking"), str(tmp_path / "events")


def test_incremental_load_end_to_end(spark, staged_dirs):
    csv_dir, tr, ev = staged_dirs
    # phase 1: hold back the last two files
    all_files = sorted(os.listdir(csv_dir))
    held = all_files[-2:]
    holding = csv_dir + "_held"
    os.makedirs(holding)
    for f in held:
        shutil.move(os.path.join(csv_dir, f), os.path.join(holding, f))

    c1 = incremental_load(spark, csv_dir, tr, ev)
    assert c1["tracking"] > 0 and c1["events"] > 0
    hwm1 = parquet_high_water_mark(spark, tr)
    assert hwm1 == all_files[-3]

    # no new files → nothing merged
    assert incremental_load(spark, csv_dir, tr, ev) == {"tracking": 0, "events": 0}

    # phase 2: deliver the held files; only they are processed
    for f in held:
        shutil.move(os.path.join(holding, f), os.path.join(csv_dir, f))
    c2 = incremental_load(spark, csv_dir, tr, ev)
    assert 0 < c2["tracking"] < c1["tracking"] + c2["tracking"]
    assert parquet_high_water_mark(spark, tr) == all_files[-1]

    tracking = spark.read.parquet(tr)
    # still exactly one row per key after the merge
    assert tracking.count() == tracking.select("oid__id").distinct().count()
    # final state == a single full load (same keys, same chosen fileName)
    full_tr = str(os.path.dirname(tr)) + "/tracking_full"
    full_ev = str(os.path.dirname(ev)) + "/events_full"
    incremental_load(spark, csv_dir, full_tr, full_ev)
    a = tracking.select("oid__id", "fileName")
    b = spark.read.parquet(full_tr).select("oid__id", "fileName")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # events table consistent with parents
    events = spark.read.parquet(ev)
    orphan = events.join(tracking.select("oid__id"), "oid__id", "left_anti")
    assert orphan.count() == 0
