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

__all__ = ["ordered_prefix_by_budget", "budget_scalar"]


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
