"""Fixed-iteration Lloyd's k-means over embedding columns — the
clustering primitive behind cluster-based corpus curation (SemDeDup-style
semantic dedup at cluster granularity, cluster-balanced data mixing,
topic discovery) and a trainable quantizer for the IVF index
(`similarity.seed_centroids` accepts the centroids this produces).

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


def kmeans_fixed(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Run ``iterations`` Lloyd steps from the deterministic seed (the
    k smallest ids' vectors, cid = seed rank) and return the final
    assignment: ``(id_col, cluster, dist_q)`` where ``dist_q`` is the
    integer squared L2 distance in the quantized space.

    ``localCheckpoint`` pins each iteration's centroid table (k rows)
    and the quantized corpus; at cluster scale persist the corpus
    frame instead — the iteration structure is unchanged.
    """
    pts = emb.select(
        F.col(id_col).alias("pid"), _int_vec(F.col(vec_col), scale).alias("v")
    )
    pts = pts.withColumn("n2", _dot_long(F.col("v"), F.col("v")))
    pts = pts.localCheckpoint(eager=True)

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

    def assign(c):
        dist = (
            F.col("n2")
            + F.col("cn2")
            - F.lit(2) * _dot_long(F.col("v"), F.col("cv"))
        )
        return (
            pts.crossJoin(F.broadcast(c))
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

    for _ in range(iterations):
        assigned = assign(cent)
        dims = assigned.select(
            "cluster", F.posexplode("v").alias("pos", "val")
        )
        cent = (
            dims.groupBy("cluster", "pos")
            .agg(
                F.sum("val").alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .withColumn("m", F.expr("s DIV c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "m"))
                    ),
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

    return assign(cent).select(
        F.col("pid").alias(id_col), "cluster", "dist_q"
    )
