"""ANN quality probe: recall@k of the bucketed search tiers vs the exact
brute-force baseline, plus the fraction of the corpus each tier scans.

An approximate index is only "done" when its quality is measured — a fast
ANN with unmeasured recall is a guess.  Output: one JSON line.

Usage: python tools/ann_recall.py [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.operators import similarity as S  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="ann_recall")
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n = emb.count()
    query_ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(n_queries).collect()]

    exact = topk_sets(S.knn_brute_force(emb, query_ids, k=k))
    label_cell = topk_sets(S.knn_ivf(emb, query_ids, k=k))
    ivf_mp = topk_sets(S.knn_ivf_centroids(emb, query_ids, k=k))

    # trained quantizer: same cell/probe budget, centroids from 3 Lloyd
    # iterations instead of the first-64-ids sample
    from airflow_postgres_etl_spark.operators.clustering import kmeans_centroids

    trained = kmeans_centroids(emb, k=S.N_IVF_CELLS, iterations=3)
    trained = trained.localCheckpoint(eager=True)
    ivf_km = topk_sets(
        S.knn_ivf_centroids(emb, query_ids, k=k, centroids=trained)
    )

    def recall(approx: dict[int, set[int]]) -> float:
        num = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        den = sum(len(exact[q]) for q in exact)
        return round(num / den, 4) if den else 1.0

    # scanned fraction of the centroid IVF: probed cells' sizes / corpus
    assigned = S.ivf_cells(emb).select("vec_id", "cell").cache()
    cell_sizes = {
        r["cell"]: r["cnt"]
        for r in assigned.groupBy("cell").agg(F.count("*").alias("cnt")).collect()
    }
    qsims = S._centroid_sims(
        emb.filter(F.col("vec_id").isin(query_ids)),
        S._centroids(emb, S.N_IVF_CELLS, "vec_id", "embedding"),
        "embedding",
    )
    from pyspark.sql.window import Window

    wq = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.desc("c_id"))
    probed = (
        qsims.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= S.IVF_PROBES)
        .select("vec_id", "c_id")
        .collect()
    )
    scanned = round(
        sum(cell_sizes.get(r.c_id, 0) for r in probed) / (len(query_ids) * n), 4
    )

    assigned_km = S.ivf_cells(emb, centroids=trained).select("vec_id", "cell").cache()
    cell_sizes_km = {
        r["cell"]: r["cnt"]
        for r in assigned_km.groupBy("cell").agg(F.count("*").alias("cnt")).collect()
    }
    qsims_km = S._centroid_sims(
        emb.filter(F.col("vec_id").isin(query_ids)), trained, "embedding"
    )
    probed_km = (
        qsims_km.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= S.IVF_PROBES)
        .select("vec_id", "c_id")
        .collect()
    )
    scanned_km = round(
        sum(cell_sizes_km.get(r.c_id, 0) for r in probed_km) / (len(query_ids) * n), 4
    )

    print(
        json.dumps(
            {
                "metric": "ann_recall",
                "sf_dir": SF_DIR,
                "n_vectors": n,
                "n_queries": len(query_ids),
                "k": k,
                "n_cells": S.N_IVF_CELLS,
                "probes": S.IVF_PROBES,
                "recall_at_k_ivf_mp": recall(ivf_mp),
                "scanned_fraction_ivf_mp": scanned,
                "recall_at_k_ivf_kmeans": recall(ivf_km),
                "scanned_fraction_ivf_kmeans": scanned_km,
                "recall_at_k_label_cell": recall(label_cell),
                "scanned_fraction_brute": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
