"""Round-7h scale stress: incrementally-maintained JOIN view.

Claim (SCALE.md): `views.refresh_join_view`'s fact-churn refresh costs
O(touched-bucket bytes), not O(table) and not O(view) — at 100 TB the
bucket count grows with the data so bucket size stays constant, and a
fixed-size merge touching one bucket refreshes the joined rollup in
constant time regardless of how large the fact table has grown.  The
dim-change leg (R_old ⋈ ΔS) is the documented exception: one broadcast-
hash pass over the old fact snapshot — linear in fact bytes, zero
shuffles — measured separately so the asymmetry is on the record.

Method: the orders table is replicated n_copies times with disjoint
o_orderkey ranges into a keyed fact table with 4*n_copies buckets
(constant rows/bucket — the 100 TB sizing discipline), dim = customer.
After a full refresh, three successive FIXED 2,000-row batches confined
to bucket 0 (filtered by the sink's own bucket expression) are merged
and the incremental refresh timed (min of the three).  Then 10 dim keys
flip segment and that refresh is timed once.

Usage: python tools/scale_stress_r7h.py [n_copies ...] (default 1 4 16 64)
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
    _bucket_expr,
    keyed_overwrite_parquet,
)
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402
from airflow_postgres_etl_spark.views import refresh_join_view  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(spark, n_copies: int) -> dict:
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.floor("o_totalprice").alias("amt"),
    )
    span = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    fact_df = o
    if n_copies > 1:
        copies = spark.range(n_copies).select(F.col("id").alias("cp"))
        fact_df = o.crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("cp") * span).alias("o_orderkey"),
            "c_custkey",
            "amt",
        )
    dim_df = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    num_buckets = 4 * n_copies
    tmp = tempfile.mkdtemp(prefix=f"ivm{n_copies}x_")
    fact, dim, mv = f"{tmp}/fact", f"{tmp}/dim", f"{tmp}/mv"
    try:
        keyed_overwrite_parquet(
            spark, fact_df, fact, key="o_orderkey",
            num_buckets=num_buckets, vacuum=False,
        )
        keyed_overwrite_parquet(
            spark, dim_df, dim, key="c_custkey", num_buckets=4, vacuum=False
        )
        args = (spark, fact, dim, mv, "c_custkey", ["c_mktsegment"], ["amt"])

        t0 = time.monotonic()
        r = refresh_join_view(*args)
        t_full = time.monotonic() - t0
        assert r["mode"] == "full"

        # fixed 2,000-row batches confined to bucket 0: the refresh
        # should read ONE constant-size bucket however big the table is
        bucket0 = (
            fact_df.filter(_bucket_expr("o_orderkey", num_buckets) == 0)
            .orderBy("o_orderkey")
            .limit(2000)
            .localCheckpoint(eager=True)
        )
        t_incr = []
        for i in range(1, 4):
            batch = bucket0.withColumn("amt", F.col("amt") + i)
            keyed_overwrite_parquet(
                spark, batch, fact, key="o_orderkey", vacuum=False
            )
            t0 = time.monotonic()
            r = refresh_join_view(*args)
            t_incr.append(time.monotonic() - t0)
            assert r["mode"] == "incremental" and not r["fact_rescan"], r

        # dim-change leg: 10 keys flip segment -> one old-fact broadcast
        # pass (linear in fact bytes, no shuffle) — the documented cost
        moved = (
            dim_df.orderBy("c_custkey").limit(10)
            .withColumn("c_mktsegment", F.lit("STRESSED"))
        )
        keyed_overwrite_parquet(spark, moved, dim, key="c_custkey", vacuum=False)
        t0 = time.monotonic()
        r = refresh_join_view(*args)
        t_dim = time.monotonic() - t0
        assert r["mode"] == "incremental" and r["fact_rescan"], r

        return {
            "copies": n_copies,
            "fact_rows": fact_df.count(),
            "num_buckets": num_buckets,
            "t_full_s": round(t_full, 2),
            "t_incr_min_s": round(min(t_incr), 2),
            "t_incr_all_s": [round(t, 2) for t in t_incr],
            "t_dim_change_s": round(t_dim, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark(app_name="scale_stress_r7h")
    for n in sizes:
        print(json.dumps(run(spark, n)), flush=True)


if __name__ == "__main__":
    main()
