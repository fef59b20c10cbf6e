"""Fixed-iteration integer-exact k-means (operators/clustering.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators.clustering import kmeans_fixed


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_kmeans_separates_two_blobs(spark):
    """Two well-separated blobs, seeds one-in-each (ids 0 and 1):
    every point lands with its blob after 3 iterations."""
    blob_a = [(0, [0.0, 0.1]), (2, [0.1, 0.0]), (4, [0.05, 0.05])]
    blob_b = [(1, [0.9, 1.0]), (3, [1.0, 0.9]), (5, [0.95, 0.95])]
    out = kmeans_fixed(_emb(spark, blob_a + blob_b), k=2, iterations=3)
    got = {r.vec_id: r.cluster for r in out.collect()}
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]


def test_kmeans_deterministic(spark):
    pts = [(i, [((i * 37) % 11) / 10.0, ((i * 53) % 7) / 10.0]) for i in range(20)]
    a = sorted(map(tuple, kmeans_fixed(_emb(spark, pts), k=3).collect()))
    b = sorted(map(tuple, kmeans_fixed(_emb(spark, pts), k=3).collect()))
    assert a == b


def test_kmeans_tie_breaks_and_drops_empty_cluster(spark):
    """Duplicate seed vectors: ties assign to the LOWEST cid, so the
    duplicate seed's cluster empties and drops (standard dataframe
    formulation, mirrored by the oracle)."""
    pts = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),   # duplicate of seed 0 -> cid 1 starves
        (2, [1.0, 1.0]),
        (3, [1.0, 1.0]),
        (4, [0.0, 0.0]),
    ]
    out = kmeans_fixed(_emb(spark, pts), k=3, iterations=2).collect()
    clusters = {r.vec_id: r.cluster for r in out}
    assert clusters[0] == clusters[1] == clusters[4] == 0
    assert clusters[2] == clusters[3] == 2
    assert set(r.cluster for r in out) == {0, 2}


def test_kmeans_exact_distance_values(spark):
    """dist_q is the integer squared L2 in the 1e-6-quantized space."""
    pts = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.5, 0.0])]
    out = {
        r.vec_id: r.dist_q
        for r in kmeans_fixed(
            _emb(spark, pts), k=2, iterations=1
        ).collect()
    }
    # after 1 update: c0 = mean{(0,0),(0.5,0)} = (250000, 0); c1 = (1e6, 0)
    assert out[0] == 250_000**2
    assert out[2] == 250_000**2
    assert out[1] == 0


def test_kmeans_centroids_are_a_drop_in_ivf_quantizer(spark):
    """kmeans_centroids matches seed_centroids' shape contract and works
    as the centroids= override across the IVF tier: every vector gets a
    non-null cell, and the ANN query runs end to end."""
    from airflow_postgres_etl_spark.operators import similarity as S
    from airflow_postgres_etl_spark.operators.clustering import (
        kmeans_centroids,
    )
    from airflow_postgres_etl_spark.sources.parquet_source import load_table

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cent = kmeans_centroids(emb, k=8, iterations=2).localCheckpoint()
    seeded = S.seed_centroids(emb, 8)
    assert cent.columns == seeded.columns
    assert cent.count() == 8

    cells = S.ivf_cells(emb, n_cells=8, centroids=cent)
    assert cells.filter(F.col("cell").isNull()).count() == 0
    knn = S.knn_ivf_centroids(
        emb, [0, 1], k=5, n_cells=8, probes=2, centroids=cent
    ).collect()
    assert len(knn) == 10  # 2 queries x top-5, all cells probed non-empty
