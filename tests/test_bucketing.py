"""Bucketed co-located join: the plan must contain no shuffle (Exchange)
for a join on the bucket key — the write amortized it."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.sources.parquet_source import load_table
from airflow_postgres_etl_spark.sources.warehouse import read_table, write_bucketed

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(o, "bt_orders", "o_orderkey", n_buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bt_lineitem",
        "o_orderkey",
        n_buckets=4,
    )
    bo, bl = read_table(spark, "bt_orders"), read_table(spark, "bt_lineitem")

    # disable broadcast so the sf0.001 tables exercise the large⋈large
    # path this technique exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").agg(
            F.round(F.sum("l_extendedprice"), 2).alias("rev")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join must not shuffle either side (bucket co-location);
        # only the tiny post-join aggregate may exchange
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part
        result = {(r.o_orderstatus, r.rev) for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # correctness: same result as the plain-parquet join
    plain = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    b = {(r.o_orderstatus, r.rev) for r in plain.collect()}
    assert result == b
