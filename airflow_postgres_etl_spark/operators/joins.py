"""Custom join operators Spark lacks natively: as-of join and range join.

**As-of join** (``pd.merge_asof`` / kdb ``aj`` / DuckDB ``ASOF JOIN``):
for each left row, attach the right row with the greatest right-timestamp
≤ the left timestamp, per key.  Spark has no primitive, so we build it
from one partitioned sort — the distributed-scalable formulation:

1. union left and right rows into one keyed stream, right rows carrying
   their payload, left rows carrying null payload;
2. sort within key by (ts, side) — right sorts *before* left at equal ts
   so the match is inclusive;
3. running ``last(payload, ignorenulls=True)`` propagates the most recent
   right payload forward;
4. keep only left rows.

Cost: exactly one shuffle (by key) + one sort — the same complexity as a
sort-merge join, no per-group pandas, no quadratic step, skew handled by
AQE.  This beats ``applyInPandas``+``pd.merge_asof`` (the other common
recipe) because it never leaves the JVM.

**Range join** (value BETWEEN lo AND hi): two physical strategies —
broadcast nested-loop for small band tables (Catalyst's own choice), and
the *bucketized* equi-join rewrite for when both sides are large: map each
value to floor(value/width) and each band to its covered bucket range,
explode bands per bucket, equi-join on bucket, re-filter exactly.  Turns
an O(N·B) nested loop into a shuffle join with ~(band_width/bucket_width)
duplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_key: str | None = None,
) -> DataFrame:
    """Backward (most-recent ≤) as-of join; see module docstring.

    Right side must be unique per (key, ts) for deterministic results —
    pre-reduce it if not.  Left columns all pass through; ``payload_cols``
    from the matched right row are appended (null when no match).
    """
    rk = right_key or key

    def null_struct(df: DataFrame, cols: list[str]):
        ddl = ",".join(
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.select(*cols).schema.fields
        )
        return F.lit(None).cast(f"struct<{ddl}>")

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        null_struct(right, payload_cols).alias("__rrow"),
    )
    r_tagged = right.select(
        F.col(rk).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        null_struct(left, list(left.columns)).alias("__lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__rrow"),
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = merged.withColumn(
        "__match", F.last("__rrow", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    return matched.select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in payload_cols],
    )


def range_join_broadcast(
    df: DataFrame, bands: DataFrame, value_col: str, lo_col: str = "lo", hi_col: str = "hi"
) -> DataFrame:
    """value ∈ [lo, hi) via broadcast nested-loop — right for small band
    tables (Catalyst picks BroadcastNestedLoopJoin)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return df.join(F.broadcast(bands), cond, "left")


def range_join_bucketized(
    df: DataFrame,
    bands: DataFrame,
    value_col: str,
    bucket_width: float,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """value ∈ [lo, hi) as an equi-join on coarse buckets (scale path for
    large band tables): explode each band over the buckets it covers, join
    on bucket id, then re-apply the exact predicate."""
    b = F.floor(F.col(value_col) / bucket_width).alias("__bucket")
    left = df.withColumn("__bucket", F.floor(F.col(value_col) / bucket_width))
    exploded_bands = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width),
            )
        ),
    )
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return (
        left.join(exploded_bands, "__bucket", "inner")
        .filter(cond)
        .drop("__bucket")
    )
