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
