"""Salted aggregation equals direct aggregation (including on a hot key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators.skew import salted_count, salted_sum


def test_salted_count_matches_direct(spark):
    # hot key: 'h' has 50x the rows of the others
    rows = [("h", float(i)) for i in range(500)] + [
        (f"k{i % 10}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    direct = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {(r.k, r["count"]) for r in salted_count(df, "k").collect()}
    assert salted == direct


def test_salted_sum_matches_direct(spark):
    rows = [("h", float(i)) for i in range(200)] + [("x", 1.5), ("x", 2.5)]
    df = spark.createDataFrame(rows, ["k", "v"])
    direct = {
        (r.k, round(r["sum(v)"], 6))
        for r in df.groupBy("k").agg(F.sum("v")).collect()
    }
    salted = {
        (r.k, round(r["sum"], 6)) for r in salted_sum(df, "k", "v").collect()
    }
    assert salted == direct


def test_salted_join_matches_plain_join(spark):
    """Output must be salt-invariant: identical rows to a plain join,
    including a pathologically hot key, and the physical join really
    runs on (key, salt)."""
    from pyspark.sql import functions as F

    from airflow_postgres_etl_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [("hot", i) for i in range(5000)] + [("cold", -1), ("orphan", -2)],
        ["k", "v"],
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], ["k", "tag"]
    )
    plain = big.join(small, "k").select("k", "v", "tag")
    salted = salted_join(big, small, "k").select("k", "v", "tag")
    a = {(r.k, r.v, r.tag) for r in plain.collect()}
    b = {(r.k, r.v, r.tag) for r in salted.collect()}
    assert a == b and len(a) == 5001
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # the join key really includes the salt
