"""Unit tests for the custom join operators with crafted interleaved data
(the testdata asof case is degenerate: all orders precede all events)."""

from __future__ import annotations

import datetime as dt

from airflow_postgres_etl_spark.operators.joins import (
    asof_join,
    range_join_broadcast,
    range_join_bucketized,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", ts("2024-01-01 10:00:00")),   # before any right -> null
            (2, "k1", ts("2024-01-01 11:00:00")),   # matches r@11:00 (inclusive)
            (3, "k1", ts("2024-01-01 11:30:00")),   # still r@11:00
            (4, "k1", ts("2024-01-01 12:05:00")),   # r@12:00 wins over r@11:00
            (5, "k2", ts("2024-01-01 12:05:00")),   # other key -> its own right
            (6, "k3", ts("2024-01-01 12:05:00")),   # key with no right rows
        ],
        ["id", "k", "t"],
    )
    right = spark.createDataFrame(
        [
            ("k1", ts("2024-01-01 11:00:00"), 100),
            ("k1", ts("2024-01-01 12:00:00"), 200),
            ("k2", ts("2024-01-01 09:00:00"), 900),
        ],
        ["k", "t", "payload"],
    )
    out = asof_join(left, right, key="k", left_ts="t", right_ts="t",
                    payload_cols=["payload"])
    got = {r.id: r.payload for r in out.collect()}
    assert got == {1: None, 2: 100, 3: 100, 4: 200, 5: 900, 6: None}
    assert out.count() == left.count()  # left-preserving


def test_range_join_variants_agree(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 499.99, 500, 1200, 2999.9, 3000, 7777])],
        ["id", "v"],
    )
    bands = spark.createDataFrame(
        [(0.0, 500.0, "a"), (500.0, 3000.0, "b"), (3000.0, 10000.0, "c")],
        ["lo", "hi", "band"],
    )
    bc = {
        (r.id, r.band)
        for r in range_join_broadcast(df, bands, "v").select("id", "band").collect()
    }
    bk = {
        (r.id, r.band)
        for r in range_join_bucketized(df, bands, "v", bucket_width=250.0)
        .select("id", "band")
        .collect()
    }
    expected = {(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "b"), (5, "c"), (6, "c")}
    assert bc == expected
    assert bk == expected


def test_asof_forward_nearest_tolerance_match_pandas(spark):
    """Differential against pd.merge_asof itself across every direction ×
    tolerance combination on interleaved data with exact-tie timestamps."""
    import pandas as pd

    lrows = [
        (1, "k1", ts("2024-01-01 10:00:00")),
        (2, "k1", ts("2024-01-01 11:00:00")),  # exact tie with a right row
        (3, "k1", ts("2024-01-01 11:29:00")),
        (4, "k1", ts("2024-01-01 12:05:00")),
        (5, "k2", ts("2024-01-01 12:05:00")),
        (6, "k3", ts("2024-01-01 12:05:00")),  # no right rows at all
        (7, "k1", ts("2024-01-01 23:00:00")),  # far from everything
    ]
    rrows = [
        ("k1", ts("2024-01-01 11:00:00"), 100),
        ("k1", ts("2024-01-01 12:00:00"), 200),
        ("k2", ts("2024-01-01 09:00:00"), 900),
    ]
    left = spark.createDataFrame(lrows, ["id", "k", "t"])
    right = spark.createDataFrame(rrows, ["k", "t", "payload"])
    lpd = pd.DataFrame(lrows, columns=["id", "k", "t"]).sort_values("t")
    rpd = pd.DataFrame(rrows, columns=["k", "t", "payload"]).sort_values("t")

    for direction in ("backward", "forward", "nearest"):
        for tol_s in (None, 3600):
            out = asof_join(
                left, right, key="k", left_ts="t", right_ts="t",
                payload_cols=["payload"], direction=direction, tolerance=tol_s,
            )
            got = {r.id: r.payload for r in out.collect()}
            exp_df = pd.merge_asof(
                lpd, rpd, on="t", by="k", direction=direction,
                tolerance=pd.Timedelta(seconds=tol_s) if tol_s else None,
            )
            exp = {
                int(r.id): (None if pd.isna(r.payload) else int(r.payload))
                for r in exp_df.itertuples()
            }
            assert got == exp, (direction, tol_s, got, exp)
            assert out.count() == left.count()


def test_asof_numeric_ts_and_tolerance(spark):
    """Numeric 'time' axis: tolerance in raw value units."""
    left = spark.createDataFrame([(1, "a", 10.0), (2, "a", 25.0)], ["id", "k", "x"])
    right = spark.createDataFrame(
        [("a", 9.0, "near"), ("a", 1.0, "far")], ["k", "x", "v"]
    )
    out = asof_join(
        left, right, key="k", left_ts="x", right_ts="x",
        payload_cols=["v"], direction="backward", tolerance=5.0,
    )
    got = {r.id: r.v for r in out.collect()}
    assert got == {1: "near", 2: None}  # 25-9=16 > 5 -> no match
