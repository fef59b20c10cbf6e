"""Approximate-aggregate (sketch) surface: HLL distinct counts and
quantile sketches are engine-specific, so they get tolerance tests against
the exact values rather than a DuckDB hash oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.sources.parquet_source import load_table

from .conftest import SF_CORRECT


def test_approx_count_distinct_within_tolerance(spark):
    events = load_table(spark, SF_CORRECT, "events")
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(3, 0.05 * row.exact)


def test_percentile_approx_close_to_exact(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01
