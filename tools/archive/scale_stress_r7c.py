"""Round-7c operator scale stress: fast NEW-key append vs CoW merge,
and bin-packing OPTIMIZE.

Claims to measure (SCALE.md):

1. **Append is O(batch) at any table size** (`sink.keyed_append`):
   appending a FIXED ~1,500-row new-key batch into a table whose data
   grew 64x stays ~flat with ``verify_new=False`` (blind append: one
   bucketed write + one manifest commit), and grows only with the
   column-pruned KEY scan with ``verify_new=True``.  The same batch as
   a CoW merge re-reads and rewrites every affected bucket — its cost
   tracks the TABLE, not the batch.

2. **OPTIMIZE pays back the file-count debt** (`optimize_keyed_table`):
   after 3 appends every bucket holds 4 files; optimize packs the
   over-threshold buckets (cost ~ their resident data) and
   `describe_keyed_table` confirms max_files_per_bucket returns to 1.

Usage: python tools/scale_stress_r7c.py [n_copies ...] (default: 1 4 16 64)
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

from airflow_postgres_etl_spark import sink  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _orders_x(spark, n):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    parts = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main(copies):
    spark = get_spark()
    results = []
    for n in copies:
        tmp = tempfile.mkdtemp(prefix=f"r7c_{n}x_")
        try:
            base = _orders_x(spark, n).localCheckpoint(eager=True)
            n_rows = base.count()
            target = f"{tmp}/t"
            sink.keyed_overwrite_parquet(
                spark, base, target, key="o_orderkey", num_buckets=16
            )
            # fixed ~1500-row new-key batches, disjoint from the table
            def batch(i):
                return (
                    base.filter(
                        (F.col("o_orderkey") < 10_000_000)
                        & (F.col("o_orderkey") % 100 == 0)
                    )
                    .select(
                        (
                            F.col("o_orderkey")
                            + F.lit(1_000_000_000 * (i + 1))
                        ).alias("o_orderkey"),
                        "o_custkey",
                    )
                    .localCheckpoint(eager=True)
                )

            b0, b1, b2 = batch(0), batch(1), batch(2)
            n_batch = b0.count()

            t0 = time.perf_counter()
            sink.keyed_append(
                spark, b0, target, key="o_orderkey", verify_new=False
            )
            blind_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            sink.keyed_append(
                spark, b1, target, key="o_orderkey", verify_new=True
            )
            verified_s = time.perf_counter() - t0

            fpb_before = sink.describe_keyed_table(target)[
                "max_files_per_bucket"
            ]
            t0 = time.perf_counter()
            packed = sink.optimize_keyed_table(spark, target)
            opt_s = time.perf_counter() - t0
            fpb_after = sink.describe_keyed_table(target)[
                "max_files_per_bucket"
            ]

            # contrast LAST: a CoW merge of the same-shape batch
            # re-reads and rewrites every affected bucket (and would
            # fold appended files itself, so it must not precede the
            # optimize measurement)
            t0 = time.perf_counter()
            sink.keyed_overwrite_parquet(
                spark, b2, target, key="o_orderkey"
            )
            cow_s = time.perf_counter() - t0

            row = {
                "copies": n,
                "rows": n_rows,
                "batch_rows": n_batch,
                "append_blind_s": round(blind_s, 3),
                "append_verified_s": round(verified_s, 3),
                "cow_merge_s": round(cow_s, 3),
                "optimize_s": round(opt_s, 3),
                "buckets_packed": packed,
                "fpb_before": fpb_before,
                "fpb_after": fpb_after,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    copies = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    main(copies)
