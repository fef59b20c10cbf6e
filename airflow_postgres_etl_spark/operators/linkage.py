"""Entity resolution / record linkage: blocked fuzzy matching.

The missing primitive next to the token-level dedup family
(``operators/dedup.py`` works on shingles / MinHash / SimHash — set
semantics): CHARACTER-level matching of dirty records against a master
entity table, the classic ER pipeline (Fellegi–Sunter shape):

1. **Block** on cheap structured attributes (equality) so candidate
   generation is an equi-join, never a cross join.
2. **Compare** within blocks with an edit-distance metric
   (``levenshtein`` — JVM expression, codegen'd).
3. **Link** each incoming record to its best candidate under a distance
   cap (window top-1 per record, deterministic tiebreak).

100 TB shape: the block join shuffles both sides ONCE on the blocking
key; per-pair work is a JVM expression; the best-link window
repartitions by the incoming record id.  Everything is linear in
candidate pairs, and candidate pairs are bounded by the block-size
distribution — the operator surfaces that distribution
(:func:`block_stats`) because ER at scale is governed by it: a single
mega-block (NULL attributes, default values) turns the join quadratic.
Production guard: ``max_block`` drops records in blocks above the cap
into a residual for a second, finer blocking pass (standard multi-pass
blocking), keeping the join's worst case bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def candidate_pairs(
    incoming: DataFrame,
    master: DataFrame,
    block_cols: list[str],
    max_block: int | None = None,
) -> DataFrame:
    """Blocked candidate generation: equi-join ``incoming`` × ``master``
    on ``block_cols``.  Non-block columns must be disjoint between the
    two frames (prefix them upstream).  With ``max_block``, master
    blocks larger than the cap are excluded (their incoming records get
    no candidates here — route them to a finer blocking pass), bounding
    the join at ``|incoming_block| * max_block`` per block."""
    m = master
    if max_block is not None:
        sizes = master.groupBy(*block_cols).agg(
            F.count(F.lit(1)).alias("__bsz")
        )
        m = master.join(
            sizes.filter(F.col("__bsz") <= max_block).drop("__bsz"),
            block_cols,
            "inner",
        )
    return incoming.join(m, block_cols, "inner")


def block_stats(df: DataFrame, block_cols: list[str]) -> DataFrame:
    """Block-size distribution (size -> how many blocks, total pairs
    contributed): THE number that decides whether blocked ER is linear.
    ``pairs`` is size², the per-block join cost against an incoming
    side of similar skew."""
    return (
        df.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("block_size"))
        .groupBy("block_size")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(
                F.col("block_size").cast("long") * F.col("block_size")
            ).alias("pairs"),
        )
    )


def best_links(
    pairs: DataFrame,
    id_col: str,
    left_col: str,
    right_col: str,
    max_dist: int,
    tiebreak_col: str,
) -> DataFrame:
    """Score candidate pairs with ``levenshtein(left, right)`` and keep
    each incoming record's single best link under ``max_dist`` —
    smallest distance, then smallest ``tiebreak_col`` (deterministic).
    Adds a ``dist`` column."""
    scored = pairs.withColumn(
        "dist", F.levenshtein(F.col(left_col), F.col(right_col))
    ).filter(F.col("dist") <= max_dist)
    w = Window.partitionBy(id_col).orderBy("dist", tiebreak_col)
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
