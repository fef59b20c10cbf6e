"""Connected components via iterative min-label propagation — the step
that turns near-duplicate *pairs* (LSH/Jaccard output) into dedup
*clusters* (keep one doc per component).

Spark has no built-in iterative graph primitive (GraphX is Scala/RDD), so
this is the classic dataframe formulation:

    label(v) ← min(label(v), min over neighbors(label(u)))   until fixpoint

Each iteration is one join + one aggregate (both shuffle on the vertex
key); ``localCheckpoint`` truncates the lineage so plans don't grow with
iterations.  Converges in O(diameter) rounds — near-dup graphs are
overwhelmingly tiny star/clique components, so a handful of rounds
suffices; ``max_iter`` bounds the pathological chain case.

At 100 TB scale this is exactly large-scale dedup practice (map-reduce CC
à la Kiveris et al. "Connected Components in MapReduce and Beyond"; the
min-label variant here is the simplest member of that family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns ``(node, component)`` where ``component`` is the minimum node
    id in the node's component.  Nodes are those appearing in any edge;
    union in isolated vertices beforehand if they must appear.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
