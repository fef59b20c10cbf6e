"""Capture the EXECUTED (AQE-final, isFinalPlan=true) plan of a query.

Static ``explain()`` dumps show ``AdaptiveSparkPlan isFinalPlan=false``
and never contain AQE runtime stage reuse; ``ReusedExchange`` claims
need this executed-plan capture (r12 — VERDICT r11 task 1).

Usage::

    python tools/capture_executed_plan.py NAME [OUT_PATH] [--sf DIR]

Executes the frame's OWN QueryExecution (``collect()`` — a noop write
plans a separate write-command execution, leaving the frame's
AdaptiveSparkPlan forever ``isFinalPlan=false``), then prints/writes
``queryExecution().executedPlan()``, which after execution is the
AQE-final tree including any runtime ``ReusedExchange`` stage reuse.
Use only on queries with small results (the captures run at sf0.01).
Measurement tool only — never imported by the engine or the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_postgres_etl_spark.plans import QUERIES  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    name = args[0]
    out_path = args[1] if len(args) > 1 else None

    spark = get_spark()
    spark.sparkContext.setJobDescription(f"capture_executed_plan: {name}")
    df = QUERIES[name](spark, sf_dir)
    n = len(df.collect())
    plan = df._jdf.queryExecution().executedPlan().toString()
    text = (
        f"# executed plan (post-run, {n} rows) for {name} @ {sf_dir}\n\n"
        f"## executedPlan().toString() after execution (AQE-final)\n"
        f"{plan}\n"
    )
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
        print(f"wrote {out_path} ({len(text)} bytes)")
        print("ReusedExchange occurrences:", plan.count("ReusedExchange"))
    else:
        print(text)


if __name__ == "__main__":
    main()
