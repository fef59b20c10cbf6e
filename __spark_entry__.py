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

from airflow_postgres_etl_spark.plans import ORACLE, QUERIES, ROTATION_EXCLUDED

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _last_green_round() -> dict[str, int]:
    """Latest round in which each query's driver row was fully green.

    The driver's differential sweep stops after ~50 queries per round; with
    more than 50 registered queries the tail would never get a driver row.
    Ordering least-recently-green-first rotates the cap window so every
    query gets periodic driver coverage: brand-new queries and any query
    whose latest row was red sort to the front (round 0), then the stalest
    green ones in registration order — so a red row is re-verified the very
    next round and the reference-core set (registered first) cycles back
    before later extensions with the same staleness.  Silent on any
    IO/parse problem — ordering is an optimization, never a correctness
    dependency.
    """
    last: dict[str, int] = {}
    try:
        import re

        for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
            m = re.search(r"r(\d+)", os.path.basename(path))
            rnd = int(m.group(1)) if m else 0
            with open(path) as fh:
                rows = json.load(fh)
            if not isinstance(rows, dict):
                continue
            for name, row in rows.items():
                ok = isinstance(row, dict) and all(
                    row.get(k) is True
                    for k in ("rows_match", "schema_match", "hash_match")
                )
                if ok:
                    last[name] = max(last.get(name, 0), rnd)
    except Exception:
        return {}
    return last


_REG_INDEX = {name: i for i, name in enumerate(QUERIES)}

# The reference-parity surface (SURVEY.md §2's Q1–Q4 over the ingested
# events table plus the FK join).  These are the queries a reference user
# actually runs; they get a staleness boost so the driver re-verifies them
# every other round even while the (much larger) extension surface rotates
# through the ~50-query cap.
_REFERENCE_CORE = (
    "q1_events_per_minute",
    "q2_top_event_types",
    "q2b_top_users",
    "q3_rank_event_types",
    "q4_customer_orders",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q5-style revenue-by-nation: scan + 4 broadcast joins + agg + sort —
    exercises the widest slice of the engine in one plan.
    """
    return QUERIES["tpch_q5_revenue_by_nation"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver-rotation surface: one representative per operator
    class/lifecycle.  Forced-branch twins, parameter variants,
    intermediates and exactness baselines are registered with
    ``rotation=False`` (r10, VERDICT r9 task 2) — they keep their
    DuckDB oracles and run in the pytest sweep
    (tests/test_queries_oracle.py covers ALL of plans.QUERIES), but
    stop consuming ~50-slot driver-window rotation slots, which is
    what bounds green-row staleness for the representatives."""
    last_green = _last_green_round()
    latest = max(last_green.values(), default=0)

    def _key(name: str) -> tuple[float, int]:
        rnd = last_green.get(name, 0)
        if name in _REFERENCE_CORE and rnd > 0:
            rnd -= 1.5  # re-cover the reference core every other round
        if rnd == 0:
            # NEVER-driver-checked queries front the whole queue: a new
            # query ships with a same-session builder-side oracle
            # differential, but it has NO independent driver row at all —
            # a strictly weaker evidence state than a 3-round-stale
            # green, which at least passed the driver's own harness once
            # (VERDICT r7 task 3 resolved the r8 window-overflow this
            # way: all 14 never-checked r7 queries land in r8's ~50-slot
            # window, and the 2 overflow victims are hard-stale greens
            # that slip one round to r9).
            rnd = -200
        elif rnd <= latest - 3:
            # HARD-stale green rows come next: a query whose last driver
            # row is >= 3 rounds old has had live code churn since its
            # last independent check — re-verify before fresher greens
            # so the rotation period stays bounded as the library grows
            # (VERDICT r6 task 4).
            rnd -= 100
        return (rnd, _REG_INDEX[name])

    order = sorted(
        (n for n in QUERIES if n not in ROTATION_EXCLUDED), key=_key
    )
    return {name: QUERIES[name] for name in order}


def oracle_sql() -> dict[str, str]:
    return {n: sql for n, sql in ORACLE.items() if n not in ROTATION_EXCLUDED}
