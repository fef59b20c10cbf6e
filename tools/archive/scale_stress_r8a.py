"""Round-8a scale stress: the line-dedup broadcast gate's crossover.

`remove_duplicate_lines` now picks its dictionary join by size
(VERDICT r7 task 1): heavy set <= broadcast_threshold broadcasts (the
r7 plan), above it a sort-merge left join on the line hash.  Claims:

1. Both branches are differential-equal (also unit-pinned); this tool
   measures the COST of each branch at growing corpus sizes so the
   crossover is a recorded number, not a guess.
2. The sort-merge branch stays linear — it adds one corpus-lines
   shuffle, so its overhead over broadcast is a roughly constant
   factor, not a growing one.

Usage: python tools/scale_stress_r8a.py [n_copies ...] (default 1 4 16)
NEVER run while pytest or another Spark job shares the host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.operators.dedup import (  # noqa: E402
    remove_duplicate_lines,
)
from airflow_postgres_etl_spark.operators.text import tokens_expr  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _multiline(spark, n_copies: int):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    if n_copies > 1:
        span = d.agg(F.max("doc_id")).collect()[0][0] + 1
        copies = spark.range(n_copies).select(F.col("id").alias("cp"))
        d = d.crossJoin(copies).select(
            (F.col("doc_id") + F.col("cp") * span).alias("doc_id"),
            F.concat(F.lit("c"), F.col("cp"), F.lit(" "), F.col("text")).alias(
                "text"
            ),
        )
    w = tokens_expr()
    n_lines = F.ceil(F.size(w) / F.lit(3.0)).cast("int")
    line_arr = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.array_join(F.slice(w, (i - 1) * 3 + 1, 3), " "),
    )
    return d.select("doc_id", F.array_join(line_arr, "\n").alias("text"))


def run(spark, n_copies: int, threshold: int, label: str) -> dict:
    docs = _multiline(spark, n_copies)
    t0 = time.monotonic()
    out = remove_duplicate_lines(docs, min_dup=2, broadcast_threshold=threshold)
    n_docs, n_in, fp = out.agg(
        F.count(F.lit(1)), F.sum("n_lines"), F.md5(F.concat_ws("", F.sort_array(F.collect_list("clean_fp"))))
    ).collect()[0]
    return {
        "op": f"line_dedup[{label}]",
        "n_copies": n_copies,
        "docs": n_docs,
        "lines": n_in,
        "result_fp": fp[:12],
        "wall_s": round(time.monotonic() - t0, 2),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="scale_r8a")
    print(json.dumps({"load1_at_start": round(os.getloadavg()[0], 2)}))
    for n in sizes:
        a = run(spark, n, 10_000_000, "broadcast")
        b = run(spark, n, 0, "sortmerge")
        assert a["result_fp"] == b["result_fp"], (a, b)
        print(json.dumps(a)); print(json.dumps(b), flush=True)


if __name__ == "__main__":
    main()
