"""assert_plan (plans/guard): fail-at-submit plan-shape contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_postgres_etl_spark.plans.guard import PlanShapeError, assert_plan


def _dfs(spark):
    a = spark.range(100).withColumnRenamed("id", "k")
    b = spark.range(10).withColumnRenamed("id", "k")
    return a, b


def test_clean_join_passes_and_returns_plan(spark):
    a, b = _dfs(spark)
    plan = assert_plan(a.join(F.broadcast(b), "k"))
    assert "BroadcastHashJoin" in plan


def test_cartesian_forbidden_by_default(spark):
    # pin the cartesian strategy via hint (the local planner otherwise
    # prefers BroadcastNestedLoopJoin, which the default guard allows —
    # scalar/1-row broadcasts are legitimate); the guard must catch it
    a = spark.range(1000).withColumnRenamed("id", "k")
    b = spark.range(1000).withColumnRenamed("id", "j")
    df = a.join(b.hint("shuffle_replicate_nl"), a.k > b.j)
    with pytest.raises(PlanShapeError, match="CartesianProduct"):
        assert_plan(df)


def test_row_python_forbidden_by_default(spark):
    from pyspark.sql.functions import udf

    a, _ = _dfs(spark)
    slow = udf(lambda x: x + 1, "long")
    with pytest.raises(PlanShapeError, match="BatchEvalPython"):
        assert_plan(a.select(slow("k")))


def test_require_broadcast(spark):
    a, b = _dfs(spark)
    hinted = a.join(F.broadcast(b), "k")
    assert_plan(hinted, require=["BroadcastHashJoin"])
    merged = a.join(b.hint("merge"), "k")
    with pytest.raises(PlanShapeError, match="BroadcastHashJoin"):
        assert_plan(merged, require=["BroadcastHashJoin"])


def test_max_shuffles_counts_exchanges(spark):
    a, _ = _dfs(spark)
    agg = a.groupBy((F.col("k") % 7).alias("g")).count()
    assert_plan(agg, max_shuffles=1)
    with pytest.raises(PlanShapeError, match="Exchange"):
        assert_plan(agg.orderBy("count"), max_shuffles=1)
