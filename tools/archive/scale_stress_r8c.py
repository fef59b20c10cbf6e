"""Round-8c scale stress: sketch-view append refresh is O(batch), not
O(table).

`refresh_distinct_view` (KMV) and `refresh_quantile_view` (bottom-k
sample) claim the append fast path reads ONLY the appended files plus
the view itself — so refreshing after a FIXED-size append must cost the
same whether the table holds 1x or 16x history.  The full rebuild of
the same view is the contrast: it scans the table, so it grows
linearly.  Both claims are measured here; correctness (merge ==
direct sketch) is pinned in tests/test_views.py and the driver's
view_distinct_ivm / view_quantile_ivm oracles.

Usage: python tools/scale_stress_r8c.py [n_copies ...] (default 1 4 16)
NEVER run while pytest or another Spark job shares the host.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sink import (  # noqa: E402
    keyed_append,
    keyed_overwrite_parquet,
)
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402
from airflow_postgres_etl_spark.views import (  # noqa: E402
    refresh_distinct_view,
    refresh_quantile_view,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _events(spark, n_copies: int, span: int):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    if n_copies == 1:
        return ev
    copies = spark.range(n_copies).select(F.col("id").alias("cp"))
    return ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("cp") * span).alias("event_id"),
        "event_type",
        "user_id",
        "value",
    )


def run(spark, n_copies: int) -> list[dict]:
    ev = load_table(spark, SF_DIR, "events")
    span = ev.agg(F.max("event_id")).collect()[0][0] + 1
    base = _events(spark, n_copies, span)
    # the FIXED append batch: one sf's worth of rows, ids past all copies
    batch = _events(spark, 1, span).select(
        (F.col("event_id") + F.lit(n_copies) * span).alias("event_id"),
        "event_type",
        "user_id",
        "value",
    )
    tmp = tempfile.mkdtemp(prefix="r8c_")
    out = []
    try:
        t = f"{tmp}/t"
        keyed_overwrite_parquet(
            spark, base, t, key="event_id", num_buckets=16, vacuum=False
        )
        mvd, mvq = f"{tmp}/mvd", f"{tmp}/mvq"
        t0 = time.monotonic()
        refresh_distinct_view(spark, t, mvd, ["event_type"], "user_id", k=128)
        full_d = time.monotonic() - t0
        t0 = time.monotonic()
        refresh_quantile_view(
            spark, t, mvq, ["event_type"], "value", "event_id", k=256
        )
        full_q = time.monotonic() - t0

        keyed_append(spark, batch, t, key="event_id", verify_new=False)
        t0 = time.monotonic()
        rd = refresh_distinct_view(spark, t, mvd, ["event_type"], "user_id", k=128)
        app_d = time.monotonic() - t0
        t0 = time.monotonic()
        rq = refresh_quantile_view(
            spark, t, mvq, ["event_type"], "value", "event_id", k=256
        )
        app_q = time.monotonic() - t0
        assert rd["mode"] == rq["mode"] == "incremental"
        assert rd["groups_recomputed"] == rq["groups_recomputed"] == 0
        out.append(
            {
                "op": "distinct_view",
                "n_copies": n_copies,
                "full_build_s": round(full_d, 2),
                "append_refresh_s": round(app_d, 2),
                "append_files_read": rd["files_read"],
            }
        )
        out.append(
            {
                "op": "quantile_view",
                "n_copies": n_copies,
                "full_build_s": round(full_q, 2),
                "append_refresh_s": round(app_q, 2),
                "append_files_read": rq["files_read"],
            }
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="scale_r8c")
    print(json.dumps({"load1_at_start": round(os.getloadavg()[0], 2)}))
    for n in sizes:
        for row in run(spark, n):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
