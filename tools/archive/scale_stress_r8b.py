"""Round-8b micro-stress: commit-path footer reads, serial vs pooled.

Tested-and-REJECTED optimization (r8): fanning `_file_stats` footer
reads onto a driver thread pool measured ~8x SLOWER than the serial
loop on the local-FS leg (70 microsecond footer reads vs pool
overhead; 634 files: 47 ms serial, 361 ms pooled) — so the sink keeps
the serial loop.  On an object store (per-file HEAD/GET latency in
milliseconds) parallelism belongs executor-side at write time, per the
_file_stats docstring.  This tool re-runs the A/B by monkeypatching a
pooled map in, so the rejection stays reproducible.

Usage: python tools/scale_stress_r8b.py [n_files ...] (default 64 256 1024)
NEVER run while pytest or another Spark job shares the host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

import airflow_postgres_etl_spark.sink as sink  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [64, 256, 1024]
    spark = get_spark(app_name="scale_r8b")
    print(json.dumps({"load1_at_start": round(os.getloadavg()[0], 2)}))
    def pooled_map(fn, items, max_workers=16):
        from concurrent.futures import ThreadPoolExecutor

        items = list(items)
        if len(items) <= 1:
            return [fn(x) for x in items]
        with ThreadPoolExecutor(max_workers=min(max_workers, len(items))) as ex:
            return list(ex.map(fn, items))

    for n in sizes:
        with tempfile.TemporaryDirectory() as d:
            (
                spark.range(n * 200)
                .select(
                    F.col("id"),
                    (F.col("id") % 97).alias("v"),
                    (F.col("id") % n).alias("p"),
                )
                .repartition(n, "p")
                .write.parquet(os.path.join(d, "data"))
            )
            rels = sorted(
                os.path.join("data", f)
                for f in os.listdir(os.path.join(d, "data"))
                if f.endswith(".parquet")
            )
            t0 = time.monotonic()
            serial = sink._file_stats(d, rels, ["id", "v"])
            t_serial = time.monotonic() - t0
            # the rejected variant: same per-file work, pooled
            t0 = time.monotonic()
            def one(rel):
                return sink._file_stats(d, [rel], ["id", "v"])
            parts = pooled_map(one, rels)
            t_pool = time.monotonic() - t0
            pooled = {k: v for part in parts for k, v in part.items()}
            assert pooled == serial
            print(json.dumps({
                "n_files": len(rels),
                "serial_s": round(t_serial, 3),
                "pooled_s": round(t_pool, 3),
                "speedup": round(t_serial / max(t_pool, 1e-9), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
