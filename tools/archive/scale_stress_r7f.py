"""Round-7f scale stress: the maintained SCD2 table.

Claim (SCALE.md): `sink.apply_changes_scd2` applying a FIXED-size CDC
batch is flat in HISTORY-table size — only the batch keys' buckets are
read, the replay window runs over (touched open rows + batch), and the
write is one replace-by-key MOR commit for keys whose tail changed.
The all-stale redelivery commits nothing.

Usage: python tools/scale_stress_r7f.py [n_copies ...] (default 1 4 16 64)
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


def main(copies):
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="r7f_")
    results = []
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderstatus").alias("v"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    try:
        for n in copies:
            feed = o
            parts = [
                o.select(
                    (F.col("k") + F.lit(i * 10_000_000)).alias("k"),
                    "seq", "v", "op",
                )
                for i in range(n)
            ]
            feed = parts[0]
            for p in parts[1:]:
                feed = feed.unionByName(p)
            feed = feed.localCheckpoint(eager=True)
            tgt = os.path.join(tmp, f"h{n}")
            sink.apply_changes_scd2(
                spark, tgt, feed, "seq", ["v"], key="k", num_buckets=16
            )
            hist_rows = sink.read_keyed_table(spark, tgt).count()
            # FIXED ~1500-key batch of fresh changes (seq above every
            # stored frontier), same absolute size at every N
            batch = (
                o.filter(F.col("k") % 10 == 0)
                .groupBy("k")
                .agg(F.max("seq").alias("m"))
                .select(
                    "k",
                    (F.col("m") + 10_000_000).alias("seq"),
                    F.lit("NEWSTAT").alias("v"),
                    F.lit("U").alias("op"),
                )
                .localCheckpoint(eager=True)
            )
            nb = batch.count()
            t0 = time.perf_counter()
            r1 = sink.apply_changes_scd2(spark, tgt, batch, "seq", ["v"])
            t_apply = time.perf_counter() - t0
            t0 = time.perf_counter()
            r2 = sink.apply_changes_scd2(spark, tgt, batch, "seq", ["v"])
            t_re = time.perf_counter() - t0
            assert r2["keys_touched"] == 0, r2
            row = {
                "copies": n,
                "hist_rows": hist_rows,
                "batch_keys": nb,
                "touched": r1["keys_touched"],
                "apply_s": round(t_apply, 3),
                "redeliver_s": round(t_re, 3),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 4, 16, 64])
