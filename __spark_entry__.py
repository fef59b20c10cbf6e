"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator/query (SURVEY.md §2 + extensions),
    each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin per query (same column
    names, same rounding) for the driver's differential correctness gate.

The real library lives in ``airflow_postgres_etl_spark/``; this module only
re-exports it.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airflow_postgres_etl_spark.plans import ORACLE, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _green_counts() -> dict[str, int]:
    """Count green driver rows per query across past CORRECTNESS_r*.json.

    The driver's differential sweep stops after ~50 queries per round; with
    more than 50 registered queries the tail would never get a driver row.
    Ordering least-checked-first rotates the cap window so every query gets
    driver coverage across rounds.  Silent on any IO/parse problem — ordering
    is an optimization, never a correctness dependency.
    """
    counts: dict[str, int] = {}
    try:
        for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
            with open(path) as fh:
                rows = json.load(fh)
            if not isinstance(rows, dict):
                continue
            for name, row in rows.items():
                ok = isinstance(row, dict) and all(
                    row.get(k) is True
                    for k in ("rows_match", "schema_match", "hash_match")
                )
                counts[name] = counts.get(name, 0) + (1 if ok else 0)
    except Exception:
        return {}
    return counts


_REG_INDEX = {name: i for i, name in enumerate(QUERIES)}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q5-style revenue-by-nation: scan + 4 broadcast joins + agg + sort —
    exercises the widest slice of the engine in one plan.
    """
    return QUERIES["tpch_q5_revenue_by_nation"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    green = _green_counts()
    order = sorted(QUERIES, key=lambda name: (green.get(name, 0), _REG_INDEX[name]))
    return {name: QUERIES[name] for name in order}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
