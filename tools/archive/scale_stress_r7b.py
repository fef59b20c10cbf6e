"""Round-7b operator scale stress: shallow clone and the MERGE
by-source clause family.

Claims to measure (SCALE.md):

1. **Shallow clone is O(file count), not O(data)**
   (`sink.clone_keyed_table`): cloning a table whose DATA grew 64×
   (same bucket count → same file count) takes ~the same time as
   cloning the 1× table, because the clone is one spec write + one
   manifest commit over per-file metadata.  A 64-bucket layout costs
   more than an 8-bucket one only through its larger file list.

2. **By-source merge write volume is O(changed keys), scan O(table)**
   (`merge_into(when_not_matched_by_source_delete=...)`): with the
   changed-key count held FIXED while the table grows N×, the delta
   commit's row count stays flat (the write), while wall time grows
   ~linearly (the absence-scoped scan the semantics inherently
   require — same caveat Delta documents).

Usage: python tools/scale_stress_r7b.py [n_copies ...] (default: 1 4 16 64)
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
        tmp = tempfile.mkdtemp(prefix=f"r7b_{n}x_")
        try:
            base = _orders_x(spark, n).localCheckpoint(eager=True)
            n_rows = base.count()

            # -- clone: O(files) -------------------------------------
            src8 = f"{tmp}/src8"
            sink.keyed_overwrite_parquet(
                spark, base, src8, key="o_orderkey", num_buckets=8
            )
            t0 = time.perf_counter()
            sink.clone_keyed_table(src8, f"{tmp}/clone8")
            clone8_s = time.perf_counter() - t0

            # -- by-source delete: fixed changed keys, growing table --
            # delete the ~1500 keys of the FIRST copy's 100-divisible
            # orderkeys: constant across n
            src = base.filter(
                (F.col("o_orderkey") < 10_000_000)
                & (F.col("o_orderkey") % 100 != 0)
            ).union(base.filter(F.col("o_orderkey") >= 10_000_000))
            t0 = time.perf_counter()
            res = sink.merge_into(
                spark,
                src8,
                src,
                when_matched_update=None,
                when_not_matched_insert=False,
                when_not_matched_by_source_delete=True,
            )
            bys_s = time.perf_counter() - t0
            m = sink._load_manifest(src8)
            delta_rows = res["deleted"]

            row = {
                "copies": n,
                "rows": n_rows,
                "clone_8bkt_s": round(clone8_s, 3),
                "by_source_merge_s": round(bys_s, 3),
                "by_source_deleted": delta_rows,
                "delta_buckets": len(m.get("deltas", {})),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    copies = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    main(copies)
