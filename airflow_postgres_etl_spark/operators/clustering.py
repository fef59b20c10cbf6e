"""Fixed-iteration Lloyd's k-means over embedding columns — the
clustering primitive behind cluster-based corpus curation (SemDeDup-style
semantic dedup at cluster granularity, cluster-balanced data mixing,
topic discovery) and a trainable quantizer for the IVF index
(`kmeans_centroids` is a drop-in ``centroids=`` override for
``similarity.ivf_cells`` / ``knn_ivf_centroids`` / ``build_ivf_index``).

Cross-engine-exact by the repo's integer house style (PageRank/BM25/MMR):

- vectors quantize to ``floor(x·10⁶)`` BIGINT components, so every
  squared L2 distance is an INTEGER — computed as ``|v|² + |c|² − 2v·c``
  whose terms are integer-valued and < 2⁵³, hence exact in either
  engine's double or int64 arithmetic regardless of accumulation order;
- assignment argmin ties break on ascending centroid id;
- centroid updates are TRUNCATED integer means (``sum DIV count`` —
  Spark's ``DIV`` and DuckDB's ``//`` both truncate toward zero), so
  iteration t+1's centroids are bit-identical cross-engine.

A fixed iteration count (not convergence-tested) keeps the unrolled
plan — and the oracle's unrolled CTE chain — deterministic.

Plan shape at scale: centroids are k rows — they BROADCAST against a
100 TB corpus; assignment is one map-side argmin per point (no
shuffle), the update one (cluster, dim)-keyed aggregate whose input is
points × d exploded rows with map-side partial aggregation; the
centroid state that crosses iterations is k·d integers.  Empty clusters
drop (the standard dataframe formulation; the oracle mirrors it).
Measured 64× curve: SCALE.md §k-means (2.3× wall for 16× points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 1_000_000


def _int_vec(col, scale: int = SCALE):
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def _dot_long(a, b):
    """Exact int64 dot of two BIGINT vectors (components ≤ 10⁶ →
    64·10¹² ≪ 2⁶³)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _quantized(emb: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    pts = emb.select(
        F.col(id_col).alias("pid"), _int_vec(F.col(vec_col), scale).alias("v")
    )
    return pts.withColumn("n2", _dot_long(F.col("v"), F.col("v"))).localCheckpoint(
        eager=True
    )


def _assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    dist = (
        F.col("n2") + F.col("cn2") - F.lit(2) * _dot_long(F.col("v"), F.col("cv"))
    )
    return (
        pts.crossJoin(F.broadcast(cent))
        .withColumn("__d", dist)
        .groupBy("pid")
        .agg(
            F.min(
                F.struct(
                    F.col("__d").alias("d"),
                    F.col("cid").alias("c"),
                    F.col("v").alias("v"),
                )
            ).alias("p")
        )
        .select(
            "pid",
            F.col("p.c").alias("cluster"),
            F.col("p.d").alias("dist_q"),
            F.col("p.v").alias("v"),
        )
    )


def _lloyd(pts: DataFrame, k: int, iterations: int) -> DataFrame:
    """``iterations`` Lloyd updates from the deterministic seed (the k
    smallest ids' vectors, cid = seed rank); returns the final centroid
    table (cid, cv, cn2).  ``localCheckpoint`` pins each iteration's
    k-row centroid state; at cluster scale persist the corpus frame
    instead — the iteration structure is unchanged."""
    w = Window.orderBy("pid")
    cent = (
        pts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            (F.col("__rn") - 1).cast("long").alias("cid"),
            F.col("v").alias("cv"),
            F.col("n2").alias("cn2"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        cent = (
            _assign(pts, cent)
            .select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
            .withColumn("m", F.expr("s DIV c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda st: st.getField("m"),
                ).alias("cv")
            )
            .select(
                F.col("cluster").alias("cid"),
                "cv",
                _dot_long(F.col("cv"), F.col("cv")).alias("cn2"),
            )
            .localCheckpoint(eager=True)
        )
    return cent


def kmeans_fixed(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Run ``iterations`` Lloyd steps from the deterministic seed and
    return the final assignment: ``(id_col, cluster, dist_q)`` where
    ``dist_q`` is the integer squared L2 distance in the quantized
    space."""
    pts = _quantized(emb, id_col, vec_col, scale)
    return _assign(pts, _lloyd(pts, k, iterations)).select(
        F.col("pid").alias(id_col), "cluster", "dist_q"
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """The trained quantizer itself: the centroids after ``iterations``
    Lloyd updates, mapped back to float space in the exact shape
    ``similarity.seed_centroids`` produces (``c_id, __cvv, __cnorm``) —
    a drop-in ``centroids=`` override for the IVF tier.  Trained
    centroids track the data's actual density instead of the id-sampled
    seeds' arbitrary positions; the recall-vs-scan trade is measured in
    ``tools/ann_recall.py`` and recorded in SCALE.md."""
    from ..functions.vectors import l2_norm_expr

    pts = _quantized(emb, id_col, vec_col, scale)
    cent = _lloyd(pts, k, iterations)
    fv = F.transform(
        F.col("cv"), lambda x: x.cast("double") / F.lit(float(scale))
    )
    return cent.select(
        F.col("cid").alias("c_id"),
        fv.alias("__cvv"),
        l2_norm_expr(fv).alias("__cnorm"),
    )
