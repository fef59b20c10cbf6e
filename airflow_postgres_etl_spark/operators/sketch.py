"""KMV (k-minimum-values) distinct sketches: mergeable, oracle-exact
cardinality and Jaccard estimation over arbitrary item streams.

Why another sketch next to ``approx_count_distinct`` (HLL): KMV is
(a) *deterministic* given the hash — the DuckDB differential reproduces
every estimate bit-for-bit, so the driver's hash gate applies, unlike
HLL whose register layout is engine-private (tolerance-tested only in
``tests/test_approx.py``); (b) *mergeable by construction* — the k
smallest of a union is computable from per-part k-smallest sets alone,
which is the property that lets 1000 executors sketch 100 TB
independently and combine ~k·parts longs on one reducer; and (c) it
supports SET operations (union size, Jaccard) that HLL alone does not.

Estimator (Bar-Yossef et al. 2002 / Beyer et al. 2007): hash items
uniformly into [0, 2^60) (md5-derived, identical in Spark and DuckDB —
same idiom as the span-dedup keys, dedup.py ``_token_hash60``); keep the
k smallest DISTINCT hash values; with fewer than k the count is exact,
otherwise ``(k-1) · 2^60 / h_k`` where ``h_k`` is the k-th smallest.
All arithmetic is int64 → IEEE double → one division: bit-identical
across engines, so results are hash-stable with no rounding.

Plan shape (the 100 TB story): one distinct over (group, hash) — the
only full-data shuffle, with map-side partial dedup — then a SALTED
two-level top-k: level 1 takes the k smallest per (group, salt) bucket
(windows over ~1/S of a group each), level 2 merges the S·k survivors
per group (a bounded window).  Level 2 is literally the KMV merge
operation run in-plan; :func:`kmv_merge_sketches` exposes the same step
over already-built sketch tables.  No collect, no UDF, no unbounded
per-group sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

#: hash domain: 15 hex chars of md5 = 60 bits, fits signed int64 exactly
#: and converts to double with the same IEEE rounding everywhere.
KMV_DOMAIN = float(2**60)

DEFAULT_K = 128
DEFAULT_SALTS = 16


def kmv_hash_expr(item: Column) -> Column:
    """Uniform 60-bit hash of an item — md5-derived so every engine in
    the differential computes the identical value (dedup.py:582)."""
    return F.conv(F.substring(F.md5(item), 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    item: Column,
    k: int = DEFAULT_K,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Per-group KMV sketch: ``group_cols…, ks array<long> (sorted, ≤k
    distinct hashes), n_k, kth`` — the mergeable summary.

    Salted two-level top-k keeps every window bounded: a group with a
    billion distinct items never sorts more than ~distinct/S rows in one
    level-1 partition, and level 2 sees exactly ≤ S·k rows per group."""
    hashes = df.select(*group_cols, kmv_hash_expr(item).alias("h")).distinct()
    w1 = Window.partitionBy(*group_cols, "salt").orderBy("h")
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.withColumn("salt", F.pmod(F.col("h"), F.lit(n_salts)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("h")).alias("ks"),
            F.count("*").cast("long").alias("n_k"),
            F.max("h").alias("kth"),
        )
    )


def kmv_estimate_expr(k: int, n_k: Column | str = "n_k", kth: Column | str = "kth") -> Column:
    """Distinct-count estimate from a sketch row: exact below the fill
    line, ``(k-1)·2^60 / h_k`` at it.  Pure int64→double arithmetic —
    reproduced verbatim by the SQL oracles."""
    n_k = F.col(n_k) if isinstance(n_k, str) else n_k
    kth = F.col(kth) if isinstance(kth, str) else kth
    return F.when(n_k < k, n_k.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_DOMAIN) / kth.cast("double")
    )


def kmv_merge_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = DEFAULT_K,
) -> DataFrame:
    """Merge many sketch rows per group into one (the distributed
    combine step): union the hash sets, keep the k smallest.  Input
    rows need only ``group_cols…, ks``; output matches
    :func:`kmv_sketch`'s schema.  Cost is O(rows · k) — sketches, not
    data, move."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        sketches.select(*group_cols, F.explode("ks").alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("h")).alias("ks"),
            F.count("*").cast("long").alias("n_k"),
            F.max("h").alias("kth"),
        )
    )


def kmv_jaccard_cols(ks_a: Column, ks_b: Column, k: int) -> dict[str, Column]:
    """Set-operation estimates from two sketches (Beyer et al. 2007):
    the k smallest of the union is itself a KMV sketch of A∪B, and the
    fraction of it present in BOTH input sketches estimates Jaccard.
    Returns ``{j_est, union_est, inter_est}`` column expressions —
    everything derived from ≤2k int64s, so a pairwise similarity matrix
    over G groups moves G²·k longs, never the data."""
    union_k = F.slice(F.array_sort(F.array_union(ks_a, ks_b)), 1, k)
    both = F.array_intersect(F.array_intersect(union_k, ks_a), ks_b)
    n_u = F.size(union_k)
    j = F.size(both).cast("double") / n_u.cast("double")
    union_est = F.when(n_u < k, n_u.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(KMV_DOMAIN)
        / F.element_at(union_k, k).cast("double")
    )
    return {
        "j_est": j,
        "union_est": union_est,
        "inter_est": j * union_est,
    }
