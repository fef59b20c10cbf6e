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


# ---------------------------------------------------------------------------
# JDBC stage-then-merge, executed end-to-end against DuckDB as the
# in-process database stand-in: the DELETE-USING / INSERT / DROP ordering,
# replace-by-key semantics, replay idempotency, and mid-transaction
# rollback are all *run*, not just string-asserted.
# ---------------------------------------------------------------------------

_MERGE_COLS = {"oid__id": "String", "from": "String", "to": "String", "ts": "DateTime"}


def _fresh_target(con):
    con.execute(create_table_sql("events", _MERGE_COLS))
    con.execute(
        """INSERT INTO "events" VALUES
           ('k1', 'a', 'b', TIMESTAMP '2023-01-01 00:00:00'),
           ('k1', 'c', 'd', TIMESTAMP '2023-01-02 00:00:00'),
           ('k2', 'e', 'f', TIMESTAMP '2023-01-03 00:00:00')"""
    )


def _stage_batch(con):
    con.execute('CREATE TABLE "events__stage" ("oid__id" TEXT, "from" TEXT, "to" TEXT, "ts" TIMESTAMP)')
    con.execute(
        """INSERT INTO "events__stage" VALUES
           ('k1', 'x', 'y', TIMESTAMP '2023-02-01 00:00:00'),
           ('k3', 'g', 'h', TIMESTAMP '2023-02-02 00:00:00')"""
    )


def _final_state(con):
    return set(
        map(tuple, con.execute('SELECT * FROM "events" ORDER BY 1, 2').fetchall())
    )


def _run_merge_transaction(con):
    con.execute("BEGIN")
    for stmt in merge_sql("events", "events__stage", "oid__id", list(_MERGE_COLS)):
        con.execute(stmt)
    con.execute("COMMIT")


def test_jdbc_merge_executes_replace_by_key():
    import datetime

    import duckdb

    con = duckdb.connect()
    _fresh_target(con)
    _stage_batch(con)
    _run_merge_transaction(con)

    got = _final_state(con)
    # BOTH old k1 rows replaced by the single staged one (child-set
    # replace); k2 untouched; k3 inserted; stage dropped.
    assert got == {
        ("k1", "x", "y", datetime.datetime(2023, 2, 1)),
        ("k2", "e", "f", datetime.datetime(2023, 1, 3)),
        ("k3", "g", "h", datetime.datetime(2023, 2, 2)),
    }
    assert con.execute(
        "SELECT count(*) FROM information_schema.tables WHERE table_name = 'events__stage'"
    ).fetchone()[0] == 0
    # high-water-mark probe runs against the merged target
    assert con.execute(high_water_mark_sql("events", "ts")).fetchone()[0] is not None


def test_jdbc_merge_replay_is_idempotent():
    import duckdb

    con = duckdb.connect()
    _fresh_target(con)
    _stage_batch(con)
    _run_merge_transaction(con)
    state1 = _final_state(con)

    # the retry scenario: the SAME batch is staged and merged again
    _stage_batch(con)
    _run_merge_transaction(con)
    assert _final_state(con) == state1


def test_jdbc_merge_failure_rolls_back_atomically():
    """If the transaction dies between DELETE and INSERT, the target must
    be unchanged — the single-transaction contract the reference relies on
    (postgres.py:30-38 uses one engine.begin() block)."""
    import duckdb

    con = duckdb.connect()
    _fresh_target(con)
    _stage_batch(con)
    before = _final_state(con)

    stmts = merge_sql("events", "events__stage", "oid__id", list(_MERGE_COLS))
    con.execute("BEGIN")
    con.execute(stmts[0])  # DELETE ran ...
    con.execute("ROLLBACK")  # ... then the connection died mid-transaction

    assert _final_state(con) == before  # no partial delete visible


def test_keyed_overwrite_heals_partial_swap_on_replay(spark, tmp_path):
    """Crash-mid-swap simulation: if only SOME affected buckets were
    swapped before a failure, replaying the same batch converges to the
    correct final state (replace-by-key is idempotent per bucket)."""
    import shutil as sh

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(f"key{i}", i) for i in range(100)], ["oid__id", "v"]
    )
    keyed_overwrite_parquet(spark, base, target, num_buckets=8)

    # snapshot the pre-merge state of every bucket dir
    snap = str(tmp_path / "snap")
    sh.copytree(target, snap)

    batch = spark.createDataFrame(
        [("key0", 1000), ("key1", 1001), ("key2", 1002)], ["oid__id", "v"]
    )
    keyed_overwrite_parquet(spark, batch, target, num_buckets=8)

    from airflow_postgres_etl_spark.sink import _bucket_expr

    hit = [
        r.b
        for r in batch.select(_bucket_expr("oid__id", 8).alias("b")).distinct().collect()
    ]
    assert len(hit) >= 2  # the scenario needs several affected buckets

    # simulate the crash: roll ONE affected bucket back to its pre-merge
    # content (as if the process died before swapping it)
    rollback = f"{BUCKET_COL}={hit[0]}"
    sh.rmtree(os.path.join(target, rollback))
    sh.copytree(os.path.join(snap, rollback), os.path.join(target, rollback))

    # replay the same batch — the retry path
    keyed_overwrite_parquet(spark, batch, target, num_buckets=8)

    got = {(r.oid__id, r.v) for r in read_keyed_table(spark, target).collect()}
    expected = {(f"key{i}", i) for i in range(3, 100)} | {
        ("key0", 1000), ("key1", 1001), ("key2", 1002)
    }
    assert got == expected
