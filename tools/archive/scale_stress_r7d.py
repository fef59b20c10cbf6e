"""Round-7d operator scale stress: fixed-iteration k-means.

Claim to measure (SCALE.md): `clustering.kmeans_fixed` is linear in
points at fixed k — assignment is a map-side broadcast argmin (k
centroids against N points, no shuffle of the corpus), the update one
(cluster, dim)-keyed aggregate over N x d exploded rows with map-side
partials; centroid state is k*d integers regardless of N.

Usage: python tools/scale_stress_r7d.py [n_copies ...] (default: 1 4 16 64)
NEVER run while pytest or another Spark job shares the host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.operators.clustering import kmeans_fixed  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _emb_x(spark, n):
    """n salted copies: each copy's vectors are component-wise nudged by
    a copy-dependent epsilon so the point cloud grows rather than
    stacking exact duplicates (which would make argmin ties trivial)."""
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    parts = [
        e.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + F.lit(i * 1e-4),
            ).alias("embedding"),
        )
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
        emb = _emb_x(spark, n).localCheckpoint(eager=True)
        n_rows = emb.count()
        t0 = time.perf_counter()
        out = kmeans_fixed(emb, k=8, iterations=3)
        sizes = {
            int(r.cluster): int(r.n)
            for r in out.groupBy("cluster").agg(F.count("*").alias("n")).collect()
        }
        wall = time.perf_counter() - t0
        row = {
            "copies": n,
            "rows": n_rows,
            "kmeans_s": round(wall, 3),
            "clusters": len(sizes),
            "max_cluster": max(sizes.values()),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    copies = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    main(copies)
