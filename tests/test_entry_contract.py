"""Driver-contract sanity: entry() runs with stable schema; queries() and
oracle_sql() keys are in 1:1 correspondence."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_keys_one_to_one():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(q) == set(o)
    assert len(q) >= 48


def test_entry_runs_with_stable_schema(spark):
    df1 = entry_mod.entry(spark)
    df2 = entry_mod.entry(spark)
    assert df1.schema == df2.schema
    rows = df1.collect()
    assert len(rows) > 0
    assert [f.name for f in df1.schema.fields] == ["nation", "revenue"]


def test_rotation_tier_contract():
    """r10 (VERDICT r9 task 2): the driver-rotation surface is one
    representative per operator class — variants/baselines/intermediates
    are registered rotation=False.  The fold must lose ZERO oracle
    coverage: every excluded query keeps its DuckDB oracle (and the
    pytest sweep iterates the FULL registry), and the reference-core
    queries are never excluded."""
    from airflow_postgres_etl_spark.plans import (
        ORACLE,
        QUERIES,
        ROTATION_EXCLUDED,
    )

    q = entry_mod.queries()
    assert len(q) == len(QUERIES) - len(ROTATION_EXCLUDED)
    assert len(q) <= 170  # the r9-prescribed rotation ceiling
    assert ROTATION_EXCLUDED <= set(QUERIES)
    # exclusion is only for queries whose differential coverage is fully
    # retained by the pytest oracle sweep — oracle-less ops may not hide
    assert ROTATION_EXCLUDED <= set(ORACLE)
    assert not ROTATION_EXCLUDED & set(entry_mod._REFERENCE_CORE)
    # the rotation surface still spans every operator-family prefix
    families = {n.split("_")[0] for n in QUERIES}
    assert families == {n.split("_")[0] for n in q}
