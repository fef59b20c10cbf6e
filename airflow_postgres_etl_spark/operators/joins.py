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


def _epoch_seconds(df: DataFrame, col: str):
    """Order-preserving double view of a ts column for delta arithmetic
    (timestamp/date → epoch seconds; numerics pass through)."""
    t = df.schema[col].dataType.typeName()
    c = F.col(col)
    if t in ("timestamp", "timestamp_ntz", "date"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_key: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join with ``pd.merge_asof``'s full direction surface.

    - ``backward`` (default): most recent right ts ≤ left ts;
    - ``forward``: earliest right ts ≥ left ts;
    - ``nearest``: whichever of the two is closer in absolute distance,
      ties to backward (pandas' rule);
    - ``tolerance`` (seconds for timestamp columns, value units for
      numerics): a candidate farther than this from the left ts is no
      match (null payload), exactly pandas' semantics.

    Every direction costs the same one shuffle + one keyed sort —
    ``nearest`` computes the backward and forward candidates as two window
    functions over the SAME sorted stream (no second sort: both windows
    share the (ts, side) ordering).  Right side must be unique per
    (key, ts) for deterministic results — pre-reduce it if not.  Left
    columns all pass through; ``payload_cols`` from the matched right row
    are appended (null when no match).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    rk = right_key or key

    def null_struct(df: DataFrame, cols: list[str], extra: str | None = None):
        fields = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.select(*cols).schema.fields
        ]
        if extra:
            fields.append(f"{extra}:double")
        return F.lit(None).cast(f"struct<{','.join(fields)}>")

    # right rows sort BEFORE left at equal ts (side 0 < 1): the backward
    # window (preceding..current) then sees equal-ts right rows —
    # inclusive ≤.  The forward window (current..following) misses them,
    # which is exactly what `forward` must NOT do — so forward flips the
    # side tags instead of re-sorting.
    l_side, r_side = (1, 0) if direction in ("backward", "nearest") else (0, 1)
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        null_struct(right, payload_cols, "__rtsd").alias("__rrow"),
    )
    r_tagged = right.select(
        F.col(rk).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        null_struct(left, list(left.columns)).alias("__lrow"),
        F.struct(
            *[F.col(c) for c in payload_cols],
            _epoch_seconds(right, right_ts).alias("__rtsd"),
        ).alias("__rrow"),
    )
    merged = l_tagged.unionByName(r_tagged)
    base = Window.partitionBy("__k").orderBy("__ts", "__side")
    w_back = base.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = base.rowsBetween(0, Window.unboundedFollowing)

    merged = merged.withColumn("__tsd", _epoch_seconds(merged, "__ts"))

    def within(match, delta):
        if tolerance is None:
            return match
        return F.when(delta <= F.lit(float(tolerance)), match)

    back = F.last("__rrow", ignorenulls=True).over(w_back)
    fwd = F.first("__rrow", ignorenulls=True).over(w_fwd)
    d_back = F.col("__tsd") - back["__rtsd"]
    d_fwd = fwd["__rtsd"] - F.col("__tsd")

    if direction == "backward":
        chosen = within(back, d_back)
    elif direction == "forward":
        chosen = within(fwd, d_fwd)
    else:  # nearest: equal-ts right rows land in the backward window
        back_ok = within(back, d_back)
        fwd_ok = within(fwd, d_fwd)
        chosen = (
            F.when(back_ok.isNull(), fwd_ok)
            .when(fwd_ok.isNull(), back_ok)
            .when(d_back <= d_fwd, back_ok)
            .otherwise(fwd_ok)
        )
    matched = merged.withColumn("__match", chosen).filter(
        F.col("__side") == l_side
    )
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
