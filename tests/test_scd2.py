"""SCD2 merge semantics: open/close/versioning across three loads."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators.scd import scd2_init, scd2_merge


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def batch(spark, rows):
    return spark.createDataFrame(rows, ["oid__id", "status", "uploadDate"])


def test_scd2_three_loads(spark):
    t1, t2, t3 = ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")
    h = scd2_init(batch(spark, [("a", "created", t1), ("b", "created", t1)]))
    assert h.count() == 2 and h.filter("is_current").count() == 2

    # a changes, b unchanged, c new
    h = scd2_merge(
        h,
        batch(spark, [("a", "shipped", t2), ("b", "created", t2), ("c", "created", t2)]),
        key="oid__id",
        compare_cols=["status"],
    )
    rows = {(r.oid__id, r.status, r.is_current): r for r in h.collect()}
    assert len(rows) == 4
    assert rows[("a", "created", False)].valid_to == t2   # closed version
    assert rows[("a", "shipped", True)].valid_from == t2  # open version
    assert ("b", "created", True) in rows                 # untouched
    assert rows[("b", "created", True)].valid_from == t1  # not re-versioned
    assert ("c", "created", True) in rows

    # a changes again; NULL transition on c
    h = scd2_merge(
        h,
        batch(spark, [("a", "delivered", t3), ("c", None, t3)]),
        key="oid__id",
        compare_cols=["status"],
    )
    cur = {r.oid__id: r.status for r in h.filter("is_current").collect()}
    assert cur == {"a": "delivered", "b": "created", "c": None}
    # a has full 3-version history with contiguous intervals
    a_hist = sorted(
        h.filter(F.col("oid__id") == "a").collect(), key=lambda r: r.valid_from
    )
    assert [r.status for r in a_hist] == ["created", "shipped", "delivered"]
    assert a_hist[0].valid_to == a_hist[1].valid_from
    assert a_hist[1].valid_to == a_hist[2].valid_from
    assert a_hist[2].valid_to is None


def test_scd2_idempotent_same_batch(spark):
    t1 = ts("2024-01-01 00:00:00")
    b = batch(spark, [("a", "created", t1)])
    h = scd2_init(b)
    h2 = scd2_merge(h, b, key="oid__id", compare_cols=["status"])
    assert h2.count() == 1 and h2.filter("is_current").count() == 1
