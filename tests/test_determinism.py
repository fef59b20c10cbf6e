"""Determinism sweep: every registered query, run twice in one session,
must produce identical results — guards against hidden nondeterminism
(unordered ties under LIMIT, first/any_value aggregates, RNG) that the
single-shot oracle differential can't see but a driver re-run would."""

from __future__ import annotations

import pytest

from airflow_postgres_etl_spark.plans import QUERIES

from .conftest import SF_SMOKE


def canon(df):
    rows = [tuple(str(v) for v in r) for r in df.collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_deterministic(spark, name):
    a = canon(QUERIES[name](spark, SF_SMOKE))
    b = canon(QUERIES[name](spark, SF_SMOKE))
    assert a == b, f"{name} returned different results across two runs"
