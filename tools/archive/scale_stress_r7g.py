"""Round-7g scale stress: hypertable LOCF rollups.

Claim (SCALE.md): `q_time_weighted_avg` / `q_time_in_state` are linear
in event count — one hash(user_id) exchange feeds both the lead/lag
window and the follow-up aggregate (plan-gated), window state is one
row of lookahead, so N x the events should cost ~N x the time with no
super-linear term.

Method: the events table is replicated n_copies times with disjoint
user_id ranges (new users, same per-user stream lengths — the shape a
growing tenant base produces), materialized via localCheckpoint so the
timed region excludes synthesis, then each rollup runs best-of-3.

Usage: python tools/scale_stress_r7g.py [n_copies ...] (default 1 4 16 64)
NEVER run while pytest or another Spark job shares the host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _twa(e):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    stepped = e.select(
        "user_id",
        t_us.alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
        F.lead(t_us).over(w).alias("nxt_us"),
    )
    dur = F.col("nxt_us") - F.col("t_us")
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dur).alias("span_us"),
            F.sum(F.col("v_c") * dur).alias("wv"),
        )
        .filter(F.col("span_us") > 0)
    )


def _tis(e):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    stepped = e.select(
        "user_id", "event_type", t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("nxt_us"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    entered = (
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).cast("long")
    return stepped.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(entered).alias("n_entries"),
        F.coalesce(F.sum(F.col("nxt_us") - F.col("t_us")), F.lit(0)).alias(
            "dur_us"
        ),
    )


def main(copies):
    spark = get_spark()
    base = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    results = []
    for n in copies:
        parts = [
            base.select(
                "event_id", "ts",
                (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
                "event_type", "value",
            )
            for i in range(n)
        ]
        e = parts[0]
        for p in parts[1:]:
            e = e.unionByName(p)
        e = e.repartition(32).localCheckpoint(eager=True)
        n_rows = e.count()
        row = {"n": n, "rows": n_rows}
        for name, fn in (("twa", _twa), ("tis", _tis)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(e).agg(
                    F.count(F.lit(1)), F.sum("n_events")
                ).collect()
                best = min(best, time.perf_counter() - t0)
            row[name] = round(best, 3)
            row[f"{name}_groups_events"] = [int(x) for x in out[0]]
        e.unpersist()
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"curve": results}))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 4, 16, 64])
