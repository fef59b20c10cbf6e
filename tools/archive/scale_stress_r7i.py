"""Round-7i scale stress: MIN/MAX view partial recompute under
append-mode ingest — the layout where group locality is real.

Claim (SCALE.md): `views.refresh_minmax_view`'s refresh cost tracks the
TOUCHED GROUPS' bytes, not the table.  With CoW merges that claim is
weak on a hash-bucketed table (a rewritten bucket contains every group,
so any scattered batch touches them all — documented in the function);
with `keyed_append` it is exact: the commit's added files contain ONLY
the batch's rows, so touched groups = the batch's groups, and the
recompute's stats-range-pruned scan (gkey tracked) opens just the files
whose range covers them — historical files are excluded by their
footers.  A fixed single-group append should therefore refresh in
~constant time while the table grows 64×.

Method: N× orders (gkey = o_custkey % 1000) into a 4N-bucket table with
gkey stats.  Full refresh timed; then three FIXED 2,000-row appends,
each entirely in a brand-new group (gkey 1000+i, keys above the span),
refresh timed after each (min of 3) with groups_recomputed recorded.

Usage: python tools/scale_stress_r7i.py [n_copies ...] (default 1 4 16 64)
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
from airflow_postgres_etl_spark.views import refresh_minmax_view  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(spark, n_copies: int) -> dict:
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 1000).cast("long").alias("gkey"),
        F.floor("o_totalprice").alias("amt"),
    )
    span = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    fact_df = o
    if n_copies > 1:
        copies = spark.range(n_copies).select(F.col("id").alias("cp"))
        fact_df = o.crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("cp") * span).alias("o_orderkey"),
            "gkey",
            "amt",
        )
    num_buckets = 4 * n_copies
    tmp = tempfile.mkdtemp(prefix=f"mm{n_copies}x_")
    target, mv = f"{tmp}/t", f"{tmp}/mv"
    try:
        keyed_overwrite_parquet(
            spark, fact_df, target, key="o_orderkey",
            num_buckets=num_buckets, stats_cols=["gkey"], vacuum=False,
        )
        args = (spark, target, mv, ["gkey"], ["amt"])
        t0 = time.monotonic()
        r = refresh_minmax_view(*args)
        t_full = time.monotonic() - t0
        assert r["mode"] == "full"

        base_key = span * max(n_copies, 1) + 1
        t_incr, groups = [], []
        for i in range(1, 4):
            batch = spark.range(2000).select(
                (F.lit(base_key) + F.lit(i) * 10_000 + F.col("id"))
                .alias("o_orderkey"),
                F.lit(1000 + i).cast("long").alias("gkey"),
                (F.col("id") * 7).alias("amt"),
            )
            keyed_append(spark, batch, target, key="o_orderkey",
                         stats_cols=["gkey"])
            t0 = time.monotonic()
            r = refresh_minmax_view(*args)
            t_incr.append(time.monotonic() - t0)
            groups.append(r["groups_recomputed"])
            assert r["mode"] == "incremental", r
            assert r["groups_recomputed"] == 1, r

        return {
            "copies": n_copies,
            "fact_rows": fact_df.count(),
            "num_buckets": num_buckets,
            "t_full_s": round(t_full, 2),
            "t_incr_min_s": round(min(t_incr), 2),
            "t_incr_all_s": [round(t, 2) for t in t_incr],
            "groups_recomputed": groups,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark(app_name="scale_stress_r7i")
    for n in sizes:
        print(json.dumps(run(spark, n)), flush=True)


if __name__ == "__main__":
    main()
