"""Ingest-throughput benchmark against the reference's published number.

The reference loads ~3.6 M post-explode event rows in ~2 h (~500 rows/s,
``/root/reference/README.md:324``; BASELINE.md).  This tool generates a
reference-shaped corpus (same CSV/CDC format, ~10 events/row), runs the
full incremental pipeline (scan → parse → dedup → explode → merge sink),
and prints one JSON line with rows/s for comparison.

Usage: python tools/ingest_bench.py [n_files] [rows_per_file]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_postgres_etl_spark.pipeline import incremental_load  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from tests.fixtures.gen_raw import generate  # noqa: E402


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    work = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        csv_dir = os.path.join(work, "csv")
        t0 = time.perf_counter()
        generate(csv_dir, n_files=n_files, rows_per_file=rows)
        gen_s = time.perf_counter() - t0

        spark = get_spark(app_name="ingest_bench")
        tr, ev = os.path.join(work, "tracking"), os.path.join(work, "events")
        t0 = time.perf_counter()
        counts = incremental_load(spark, csv_dir, tr, ev)
        load_s = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "metric": "ingest_events_rows_per_sec",
                    "value": round(counts["events"] / load_s, 1),
                    "unit": "rows/sec",
                    "events_rows": counts["events"],
                    "tracking_rows": counts["tracking"],
                    "load_sec": round(load_s, 2),
                    "gen_sec": round(gen_s, 2),
                    "n_files": n_files,
                    "reference_baseline_rows_per_sec": 500,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
