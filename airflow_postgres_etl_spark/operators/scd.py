"""Slowly-changing-dimension type-2 merge — CDC history tracking.

The keyed-overwrite sink (`sink.py`) is SCD type 1: latest row wins, history
lost.  This operator keeps it: every key change closes the current version
(``valid_to`` stamped, ``is_current`` false) and appends the new one.
Spark has no MERGE without Delta/Iceberg, so the merge is expressed as
joins + union over the history table (the anti-join+union+window emulation;
with Delta on the classpath this becomes one ``MERGE`` statement):

- unchanged current rows (key absent from batch, or attributes equal):
  pass through;
- changed rows: current version closed, new version opened;
- new keys: opened.

One shuffle on the key; history rewritten per merge (at scale: partition
the history by ``is_current`` / date so only the current slice rewrites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCD2_COLS = ["valid_from", "valid_to", "is_current"]


def scd2_init(batch: DataFrame, ts_col: str = "uploadDate") -> DataFrame:
    """First load: every row is an open version."""
    return (
        batch.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    key: str,
    compare_cols: list[str],
    ts_col: str = "uploadDate",
) -> DataFrame:
    """Merge a new batch into an SCD2 history table (see module doc).

    ``compare_cols`` define "changed"; NULL-safe equality (``eqNullSafe``)
    so NULL→value and value→NULL transitions are detected.
    """
    batch_cols = [c for c in batch.columns]
    b = batch.select(
        F.col(key).alias("__bk"), *[F.col(c).alias(f"__b_{c}") for c in batch_cols]
    )
    cur = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))

    joined = cur.join(b, cur[key] == b["__bk"], "left")
    changed_cond = F.col("__bk").isNotNull() & ~_all_equal(compare_cols)

    # current rows that stay open: no batch row, or batch row identical
    still_open = joined.filter(~changed_cond).select(*history.columns)
    # current rows whose key changed: close them at the batch timestamp
    newly_closed = (
        joined.filter(changed_cond)
        .select(
            *[F.col(c) for c in history.columns if c not in ("valid_to", "is_current")],
            F.col(f"__b_{ts_col}").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
        .select(*history.columns)
    )
    # batch rows that open a new version: new key, or changed attributes
    cur_k = cur.select(F.col(key).alias("__ck"), *[F.col(c).alias(f"__c_{c}") for c in compare_cols])
    b_joined = batch.join(cur_k, batch[key] == cur_k["__ck"], "left")
    opens_cond = F.col("__ck").isNull() | ~_all_equal_batchside(compare_cols)
    opened = (
        b_joined.filter(opens_cond)
        .select(*batch_cols)
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .select(*history.columns)
    )
    return closed.unionByName(still_open).unionByName(newly_closed).unionByName(opened)


def _all_equal(compare_cols: list[str]):
    cond = F.lit(True)
    for c in compare_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__b_{c}"))
    return cond


def _all_equal_batchside(compare_cols: list[str]):
    cond = F.lit(True)
    for c in compare_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__c_{c}"))
    return cond
