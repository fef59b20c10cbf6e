"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 (fast) — the local mirror of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from airflow_postgres_etl_spark.plans import ORACLE, QUERIES

from .conftest import SF_SMOKE
from .oracle_utils import compare, run_oracle


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLE)
    # non-SQL-expressible ops are allowed to omit an oracle, but must be
    # intentional — list them here when added
    allowed_missing: set[str] = set(ORACLE_EXEMPT)
    assert missing <= allowed_missing, f"queries missing oracles: {missing}"


ORACLE_EXEMPT: list[str] = []


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, name):
    spark_df = QUERIES[name](spark, SF_SMOKE)
    oracle_df = run_oracle(ORACLE[name], SF_SMOKE)
    compare(spark_df, oracle_df)
