"""Skew-mitigation utilities.

AQE's skew-join handling (on in `session.py`) covers joins; for *aggregations*
on pathologically hot keys the classic fix is salting: spread each key over
``n_salts`` sub-keys, partially aggregate, then combine.  Two shuffles, but
the first is uniform — no straggler task pinned to the hot key.

Only worth it for algebraic aggregates (count/sum/min/max/avg-as-sum+count);
Spark's own partial aggregation already handles mild skew, so reach for this
when one key dominates a partition's worth of data (e.g. the empty-string
token, the null user).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """groupBy(key).count() with a salted two-stage aggregation.

    Stage 1 groups on (key, salt) — uniform shuffle; stage 2 sums the
    partial counts per key (tiny input).
    """
    salt = (F.rand(seed=7) * n_salts).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").cast("long").alias("count"))


def salted_sum(df: DataFrame, key: str, value: str | Column, n_salts: int = 16) -> DataFrame:
    v = F.col(value) if isinstance(value, str) else value
    salt = (F.rand(seed=7) * n_salts).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .withColumn("__v", v)
        .groupBy(key, "__salt")
        .agg(F.sum("__v").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("sum"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each of the big side's keys over
    ``n_salts`` shuffle partitions and replicate the small side across
    all salts, joining on ``(key, salt)``.

    AQE's skew-join split handles most sort-merge skew automatically;
    this is the explicit fallback for when the skewed partition can't be
    split (single monster KEY, not just a monster partition) — one hot
    key's rows land in ``n_salts`` tasks instead of one.  The join
    OUTPUT is salt-invariant (every big row still meets every matching
    small row exactly once), so the salt expression only needs to
    spread rows, not be reproducible: it hashes the row id.  Cost: the
    small side shuffles ``n_salts``x — size it like a broadcast
    candidate, not a fact table."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast(
        "int"
    )
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, [key, "__salt"], how).drop("__salt")
