"""Round-7 operator scale stress: DQ-gate overhead on the merge path,
per-file sketch sidecar incrementality, and streaming sketch merges.

Claims to measure (SCALE.md):

1. **DQ gate** (`gate_and_merge`): a gated merge costs the plain merge
   plus ~one map-side projection and the one-aggregate report — the
   gated/plain time RATIO stays ~flat as the batch grows N×, and the
   quarantine merge's extra cost tracks the bad-row count, not the
   batch.

2. **Sketch sidecar** (`tablesketch`): the FIRST `Table.sketch()` call
   scans all live files (∝ N); after a single-key merge the next call
   scans only the one rewritten bucket's files (~flat in N); a repeat
   call is sidecar-only (~flat, sketch rows not data).

3. **Streaming sketch merges** (`merge_kmv_batch`/`merge_cms_batch`):
   absorbing an N×-row batch into a stored sketch table costs ~the
   batch's own sketch build; the stored side contributes only its
   lookup_keys-pruned sketch rows (k longs / d·w cells per group),
   so time tracks batch size with a flat stored-side term.

Usage: python tools/scale_stress_r7.py [n_copies ...] (default: 1 4 16 64)
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

from airflow_postgres_etl_spark.api import Engine  # noqa: E402
from airflow_postgres_etl_spark.operators import expectations as E  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402
from airflow_postgres_etl_spark.streaming.sketch_stream import (  # noqa: E402
    merge_cms_batch,
    merge_kmv_batch,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _orders_x(spark, n):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    parts = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)


def gate_stress(spark, ns):
    rules = [
        E.expect("not_null_orderdate", "o_orderdate IS NOT NULL"),
        E.expect("price_positive", "o_totalprice > 0"),
        E.expect("status_accepted", "o_orderstatus IN ('O','F','P')"),
    ]
    for n in ns:
        batch = _orders_x(spark, n)
        # plant ~1% violations so the quarantine path is exercised
        batch = batch.withColumn(
            "o_orderdate",
            F.when(F.col("o_orderkey") % 101 == 0, F.lit(None)).otherwise(
                F.col("o_orderdate")
            ),
        ).localCheckpoint(eager=True)
        rows = batch.count()
        for label, expectations in (("plain", None), ("gated", rules)):
            tmp = tempfile.mkdtemp(prefix="r7gate_")
            t = Engine(spark).table(os.path.join(tmp, "t"))
            t0 = time.perf_counter()
            t.merge(batch, expectations=expectations, key="o_orderkey", num_buckets=16)
            dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "op": "dq_gate_merge",
                        "n": n,
                        "rows": rows,
                        "mode": label,
                        "sec": round(dt, 2),
                    }
                ),
                flush=True,
            )
            shutil.rmtree(tmp, ignore_errors=True)


def sidecar_stress(spark, ns):
    for n in ns:
        batch = _orders_x(spark, n)
        tmp = tempfile.mkdtemp(prefix="r7sketch_")
        t = Engine(spark).table(os.path.join(tmp, "t"))
        t.merge(batch, key="o_orderkey", num_buckets=16)
        timings = {}
        t0 = time.perf_counter()
        t.sketch(["o_custkey"]).collect()
        timings["first_full_build"] = time.perf_counter() - t0
        # single-key merge → one bucket rewritten
        t.merge(
            spark.createDataFrame(
                [(1, 1, "O", 1.0, "1995-01-01")],
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate string",
            ).select(
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
            ),
            key="o_orderkey",
            num_buckets=16,
        )
        t0 = time.perf_counter()
        t.sketch(["o_custkey"]).collect()
        timings["after_1key_merge"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.sketch(["o_custkey"]).collect()
        timings["repeat_sidecar_only"] = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "sketch_sidecar",
                    "n": n,
                    **{k: round(v, 2) for k, v in timings.items()},
                }
            ),
            flush=True,
        )
        shutil.rmtree(tmp, ignore_errors=True)


def stream_sketch_stress(spark, ns):
    docs = load_table(spark, SF_DIR, "documents")
    for n in ns:
        batch = (
            docs.select(
                F.col("source").alias("group"),
                F.explode(F.split(F.lower("text"), r"\s+")).alias("item"),
            )
            .crossJoin(spark.range(n).select(F.col("id").alias("__c")))
            .select(
                "group",
                F.concat_ws("_", "item", "__c").alias("item"),
            )
            .localCheckpoint(eager=True)
        )
        rows = batch.count()
        tmp = tempfile.mkdtemp(prefix="r7stream_")
        # pre-seed the stored tables so the merge measures the steady state
        merge_kmv_batch(spark, batch.limit(1000), os.path.join(tmp, "kmv"))
        merge_cms_batch(spark, batch.limit(1000), os.path.join(tmp, "cms"))
        t0 = time.perf_counter()
        merge_kmv_batch(spark, batch, os.path.join(tmp, "kmv"))
        kmv_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        merge_cms_batch(spark, batch, os.path.join(tmp, "cms"))
        cms_s = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "stream_sketch_merge",
                    "n": n,
                    "rows": rows,
                    "kmv_sec": round(kmv_s, 2),
                    "cms_sec": round(cms_s, 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark(app_name="scale_stress_r7", shuffle_partitions=32)
    gate_stress(spark, ns)
    sidecar_stress(spark, ns)
    stream_sketch_stress(spark, ns)


if __name__ == "__main__":
    main()
