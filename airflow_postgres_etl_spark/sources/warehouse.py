"""Bucketed warehouse tables — co-located joins without a shuffle.

At 100 TB the dominant cost of a large⋈large equi-join is the shuffle of
both sides.  Writing the tables bucketed (hash-partitioned on disk) on the
join key amortizes that shuffle into the write: every later join/aggregate
on the key reads co-located buckets and plans **no Exchange** (verified by
``tests/test_bucketing.py``).  This is Spark's answer to the reference's
Postgres-side indexed key (``oid__id``) — but it also accelerates every
repeated analytical join, which an index does not.

Requires a catalog (`saveAsTable`); local Derby metastore suffices here,
any Hive-compatible catalog in production.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and bucket-sorted) by ``key``.

    ``sortBy`` makes later sort-merge joins skip the per-task Sort too.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # a dropped table's directory can outlive the metastore entry
        # (fresh Derby metastore, persistent warehouse dir) — clear both
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite (`INSERT OVERWRITE ... PARTITION`):
    replace ONLY the partitions present in ``df``, leave every other
    partition's files untouched — the daily-replay primitive (re-land
    one day of a date-partitioned fact table without rewriting or even
    listing the other 3,650 days).

    Uses the per-write ``partitionOverwriteMode=dynamic`` option, not
    the session conf, so a concurrent static-overwrite writer elsewhere
    in the session is unaffected.  At 100 TB: write cost is O(replaced
    partitions); readers filtering on the partition column prune to
    them (PartitionFilters in the scan — gated in
    tests/test_partitioned.py)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned parquet root; partition columns come back from
    directory names (hive-style), and filters on them prune at plan
    time before any file opens."""
    return spark.read.parquet(path)
