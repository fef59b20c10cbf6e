"""Round-7j scale stress: line-level dedup and the grid radius join.

Claims (SCALE.md):

1. `dedup.remove_duplicate_lines` is linear in corpus lines: its only
   corpus-wide shuffles are ONE count on the 60-bit line hash (partial
   agg collapses repeats map-side, so shuffle rows track DISTINCT
   lines) and the per-doc reassembly; the heavy dictionary broadcasts.
   64x the documents should cost ~64x (or less, since the distinct-line
   space saturates while repeats collapse map-side).

2. `geo.radius_join` is linear in the LEFT side at fixed right-side
   density: the 9x neighbor fan-out lands on the small right frame and
   candidates are bounded by cell occupancy, so 64x the left points at
   a fixed right table should cost ~64x (never quadratic — the plan
   has no cartesian product by construction).

Usage: python tools/scale_stress_r7j.py [n_copies ...] (default 1 4 16 64)
NEVER run while pytest or another Spark job shares the host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.operators import geo  # noqa: E402
from airflow_postgres_etl_spark.operators.dedup import (  # noqa: E402
    remove_duplicate_lines,
)
from airflow_postgres_etl_spark.operators.text import tokens_expr  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _docs(spark, n_copies: int):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    if n_copies > 1:
        span = d.agg(F.max("doc_id")).collect()[0][0] + 1
        copies = spark.range(n_copies).select(F.col("id").alias("cp"))
        # vary the text per copy so the distinct-line space grows too
        # (a pure replication would make every line heavy — trivial)
        d = d.crossJoin(copies).select(
            (F.col("doc_id") + F.col("cp") * span).alias("doc_id"),
            F.concat(F.lit("c"), F.col("cp"), F.lit(" "), F.col("text")).alias(
                "text"
            ),
        )
    return d


def run_line_dedup(spark, n_copies: int) -> dict:
    docs = _docs(spark, n_copies)
    w = tokens_expr()
    n_lines = F.ceil(F.size(w) / F.lit(3.0)).cast("int")
    line_arr = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.array_join(F.slice(w, (i - 1) * 3 + 1, 3), " "),
    )
    multiline = docs.select("doc_id", F.array_join(line_arr, "\n").alias("text"))
    t0 = time.monotonic()
    out = remove_duplicate_lines(multiline, min_dup=2)
    n_docs, n_kept, n_in = out.agg(
        F.count(F.lit(1)), F.sum("n_kept"), F.sum("n_lines")
    ).collect()[0]
    wall = time.monotonic() - t0
    return {
        "op": "line_dedup",
        "n_copies": n_copies,
        "docs": n_docs,
        "lines": n_in,
        "kept": n_kept,
        "wall_s": round(wall, 2),
    }


def run_radius_join(spark, n_copies: int) -> dict:
    def point(df, key, prefix):
        h = lambda tag: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{tag}{prefix}:"), F.col(key))), 1, 15
                ),
                16, 10,
            ).cast("long")
        )
        return df.select(
            key,
            ((h("lat") % 120000000) / 1000000.0 - 60.0).alias("lat"),
            ((h("lon") % 360000000) / 1000000.0 - 180.0).alias("lon"),
        )

    c = load_table(spark, SF_DIR, "customer").select("c_custkey")
    if n_copies > 1:
        span = c.agg(F.max("c_custkey")).collect()[0][0] + 1
        copies = spark.range(n_copies).select(F.col("id").alias("cp"))
        c = c.crossJoin(copies).select(
            (F.col("c_custkey") + F.col("cp") * span).alias("c_custkey")
        )
    left = point(c, "c_custkey", "c")
    right = point(
        load_table(spark, SF_DIR, "supplier").select("s_suppkey"),
        "s_suppkey", "s",
    )
    t0 = time.monotonic()
    n_pairs = geo.radius_join(left, right, 500.0).count()
    wall = time.monotonic() - t0
    return {
        "op": "radius_join",
        "n_copies": n_copies,
        "left_points": c.count(),
        "pairs": n_pairs,
        "wall_s": round(wall, 2),
    }


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark(app_name="scale_r7j", shuffle_partitions=32)
    for n in sizes:
        print(json.dumps(run_line_dedup(spark, n)), flush=True)
    for n in sizes:
        print(json.dumps(run_radius_join(spark, n)), flush=True)
