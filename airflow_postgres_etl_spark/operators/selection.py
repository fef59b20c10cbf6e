"""Corpus subset selection under a global budget — "take the best
documents until the token budget is spent", the curation step that sizes
a training mix (reference scope: corpus curation beyond the ETL chain;
the reference itself delegates all selection to downstream SQL,
README.md's ad-hoc queries — here it is a first-class operator).

The naive formulation is a running total over ONE global ordering
(``sum(cost) OVER (ORDER BY priority DESC, key)``) — a single-partition
window over every row, the canonical scale-killer: at 100 TB one
executor thread would stream the whole corpus.  :func:`ordered_prefix_by_budget`
decomposes it exactly, the same interval-boundary trick as
``q_rolling_distinct_users``:

1. aggregate cost per DISTINCT priority value (one hash-agg shuffle;
   the result is bounded by the priority domain, not the corpus);
2. run the global cumulative sum over that small aggregated frame
   (single-partition window, but over ~|distinct priorities| rows);
3. join each row back to its group's "cost before this group" and add a
   WITHIN-group running sum partitioned by priority — fully parallel.

Row-level cumulative = group prefix + within-group prefix, exactly the
(priority DESC, key ASC) global running total, with no per-row global
window anywhere in the plan.  Works for any total order whose first
component has bounded cardinality (scores rounded to fixed precision,
integer lengths, bucketed ranks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "ordered_prefix_by_budget",
    "budget_scalar",
    "dsir_bucket_expr",
    "dsir_select",
]


def budget_scalar(df: DataFrame, cost: str, frac: float) -> DataFrame:
    """One-row frame ``(budget)`` = ``floor(frac * sum(cost))`` — the
    data-dependent budget as a broadcastable scalar, never a
    driver-side ``collect``."""
    return df.agg(
        F.floor(F.lit(frac) * F.sum(cost)).cast("long").alias("budget")
    )


def ordered_prefix_by_budget(
    df: DataFrame,
    budget: int | DataFrame,
    *,
    priority: str = "n_chars",
    cost: str = "n_tokens",
    key: str = "doc_id",
) -> DataFrame:
    """Keep the maximal prefix of ``df`` in (``priority`` DESC, ``key``
    ASC) order whose running ``cost`` total stays ≤ ``budget``
    (inclusive: a row is kept iff the cumulative cost *through it* fits).

    ``budget`` is either a plain int or a one-row DataFrame with a
    ``budget`` column (see :func:`budget_scalar`) — the latter is
    broadcast, keeping the whole computation one lazy plan.

    Exactness: groups are distinct ``priority`` values, so
    group-prefix + within-group-prefix is precisely the global running
    total; ``key`` must be unique (ties within a group are ordered by
    it, so the kept set is deterministic).  ``priority`` and ``cost``
    must be non-NULL: a NULL priority never equi-joins back to its
    group (the row would silently drop) and a NULL cost vanishes from
    sums — filter or impute upstream.

    Scale shape: one hash-agg shuffle (per-priority cost), one
    single-partition window over the AGGREGATED frame only, one
    equi-join on priority, one partitioned window.  The skew case —
    a single priority value holding most of the corpus — degrades the
    within-group window to that group's size, the same exposure as any
    keyed window; pre-salt the priority (append a hash bucket of
    ``key`` and re-aggregate) if one value dominates.
    """
    grp = df.groupBy(priority).agg(F.sum(cost).alias("__grp_cost"))
    w_grp = Window.orderBy(F.desc(priority)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # global window over |distinct priorities| rows — the safe
    # post-aggregate class, never per-row
    grp = grp.withColumn("__cum_end", F.sum("__grp_cost").over(w_grp))
    grp = grp.select(
        priority, (F.col("__cum_end") - F.col("__grp_cost")).alias("__before")
    )

    w_in = Window.partitionBy(priority).orderBy(key).rowsBetween(
        Window.unboundedPreceding, 0
    )
    j = df.join(grp, priority)
    budget_col: Column
    if isinstance(budget, DataFrame):
        j = j.crossJoin(F.broadcast(budget))
        budget_col = F.col("budget")
    else:
        budget_col = F.lit(int(budget))
    cum = F.col("__before") + F.sum(cost).over(w_in)
    out = j.withColumn("__cum", cum).filter(F.col("__cum") <= budget_col)
    drop = ["__before", "__cum"] + (
        ["budget"] if isinstance(budget, DataFrame) else []
    )
    return out.drop(*drop)


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# NeurIPS).  Select raw-pool documents that look like a small target
# corpus: fit bag-of-hashed-ngram distributions p (target) and q (pool),
# score each pool doc by its log importance weight
# log w_d = Σ_b c_db · (ln p_b − ln q_b), then draw k docs WITHOUT
# replacement with probability ∝ w_d via the Efraimidis–Spirakis
# exponential race — in log space, rank key ln(−ln u_d) − log w_d with
# u_d a DETERMINISTIC uniform from the doc id's md5 (the same 60-bit
# hash idiom as the KMV sketches), take the k smallest.  Determinism
# makes the whole pipeline SQL-twinnable: the DuckDB oracle reproduces
# every bucket count, both smoothed distributions, every weight and
# every race key (rounded to 9 decimals before ranking — ln/exp agree
# across engines to ~1 ulp, far inside the grid).
#
# Plan shape at 100 TB: ONE corpus tokenize+explode pass feeding a
# (doc, bucket) hash aggregate (map-side combinable) whose exchange both
# consumers share — the per-bucket polarity totals and the per-doc pool
# counts (r12; the executed plan shows the (doc, bucket) stage computed
# once and ReusedExchange for the second consumer, pinned by
# tests/test_selection.py).  The polarity rides the aggregate as a VALUE
# (max(is_target)), not a grouping key: r11 grouped by (is_target, doc,
# bucket) and filtered each consumer on the polarity, which Catalyst
# pushed below the aggregate into the scans as complementary
# PushedFilters — one tokenize pass per consumer (3 passes; see
# plans/r12/pipeline_dsir_select_before.txt).  An explicit
# isNotNull(bucket) on the exploded stream keeps both consumer subtrees
# canonically identical (see the comment at the filter).  The ratio
# table is
# n_buckets rows → BROADCAST into the per-doc bucket counts, and the
# selection is a global top-k (TakeOrdered — no full sort).  Nothing
# driver-side, nothing quadratic; the corpus is tokenized ONCE.
# ---------------------------------------------------------------------------

#: 60-bit md5 hash domain (matches operators/sketch.KMV_DOMAIN)
_DSIR_DOMAIN = float(2**60)


def dsir_bucket_expr(gram: Column, n_buckets: int) -> Column:
    """Feature bucket of an n-gram: 60-bit md5 hash mod ``n_buckets`` —
    deterministic and engine-portable (same idiom as sketch.py)."""
    h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def dsir_select(
    df: DataFrame,
    *,
    is_target: Column,
    grams: Column,
    id_col: str = "doc_id",
    k: int = 100,
    n_buckets: int = 1024,
    smoothing: float = 0.5,
) -> DataFrame:
    """Importance-resample ``k`` documents from the pool (rows where
    ``~is_target``) toward the target distribution (rows where
    ``is_target``).

    ``grams`` is the feature array per row (e.g. unigrams+bigrams).
    Returns ``(id_col, logw, sel_key)`` — the k selected pool docs,
    ordered by the race key — with both doubles rounded to 9 decimals
    (the ranking happens ON the rounded key, so the order is
    reproducible bit-for-bit across engines).  A pool doc with an empty
    gram array carries no evidence and is never selected.  Add-λ
    smoothing (``smoothing``) keeps unseen buckets finite on both
    sides.
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        is_target.alias("__t"),
        grams.alias("__g"),
    )
    # The isNotNull is semantically a no-op (a NULL bucket requires a
    # NULL gram, and null grams carry no evidence — they could never
    # match the ratio table's inner join below), but it is load-bearing
    # for the plan: the per-doc consumer joins on __b, so Catalyst
    # infers isnotnull(__b) on that side and pushes it below the (id,
    # bucket) aggregate — WITHOUT the explicit filter the two consumer
    # subtrees canonicalize differently (one carries the inferred
    # filter, the other does not) and AQE cannot reuse the exchange:
    # the corpus would be tokenized twice.  With it, both subtrees are
    # byte-identical and the second consumer is a ReusedExchange
    # (plans/r12/pipeline_dsir_select_after.txt).
    ex = (
        base.select("__id", "__t", F.explode("__g").alias("__gram"))
        .withColumn("__b", dsir_bucket_expr(F.col("__gram"), n_buckets))
        .filter(F.col("__b").isNotNull())
    )

    # ONE corpus pass (r12, guide §2.3/§2.4): both consumers below — the
    # per-bucket polarity totals and the per-doc pool counts — derive
    # from this single (id, bucket) aggregate, so the expensive
    # tokenize+explode map side is ONE exchange computed once and reused
    # (executedPlan shows ReusedExchange for the second consumer).  The
    # polarity is an AGGREGATED column (max(__t)), deliberately NOT a
    # grouping key: a filter on a grouping column is pushed below the
    # aggregate into the scan (the r11 shape — complementary
    # PushedFilters on lang split the corpus pass per consumer, 3
    # tokenizations), while a filter on an aggregate output cannot
    # cross the aggregate.  Exact because ``id_col`` identifies one
    # input row (a requirement the race key already imposes — duplicate
    # ids would collide on md5(id)), so every exploded gram of a doc
    # carries the same __t and max over the group IS that value.
    # Counts compose exactly: per-bucket totals are integer sums of the
    # per-doc counts, so every downstream number is bit-identical.
    cnt = ex.groupBy("__id", "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.max("__t").alias("__t"),
    )
    # both polarities' bucket totals in ONE second-level aggregate
    # (replaces the separate tgt/src aggregates + full_outer join), and
    # the corpus-wide totals as window sums over the <= n_buckets rows
    # (replaces two scalar aggregates + two crossJoins).  Identical
    # arithmetic on identical longs (sum-of-when = filtered sum; window
    # sum ignores NULLs exactly like the filtered scalar sum), so every
    # smoothed double is bit-identical to the r11 form.
    bkt = cnt.groupBy("__b").agg(
        F.sum(F.when(F.col("__t"), F.col("__c"))).cast("long").alias("__ct"),
        F.sum(F.when(~F.col("__t"), F.col("__c"))).cast("long").alias("__cs"),
    )
    lam = float(smoothing)
    denom = F.lit(lam * n_buckets)
    w_all = Window.partitionBy()
    ratio = bkt.select(
        "__b",
        (
            F.log(
                (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(lam))
                / (F.sum("__ct").over(w_all) + denom)
            )
            - F.log(
                (F.coalesce(F.col("__cs"), F.lit(0)) + F.lit(lam))
                / (F.sum("__cs").over(w_all) + denom)
            )
        ).alias("__r"),
    )

    docb = cnt.filter(~F.col("__t")).select("__id", "__b", "__c")
    scored = (
        docb.join(F.broadcast(ratio), "__b")
        .groupBy("__id")
        .agg(F.sum(F.col("__c") * F.col("__r")).alias("__logw"))
    )
    # deterministic uniform in (0,1) from the id's md5: (h + 0.5) / 2^60
    u = (
        F.conv(
            F.substring(F.md5(F.col("__id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(_DSIR_DOMAIN)
    key = F.log(-F.log(u)) - F.col("__logw")
    return (
        scored.select(
            F.col("__id").alias(id_col),
            F.round(F.col("__logw"), 9).alias("logw"),
            F.round(key, 9).alias("sel_key"),
        )
        .orderBy("sel_key", id_col)
        .limit(k)
    )
