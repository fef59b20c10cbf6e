"""CSV directory source with file lineage (reference S1–S4).

The reference lists files on the driver, sorts lexicographically, reads one
pandas frame per file and stamps ``fileName`` manually
(``events_table.py:45-50``, ``postgres.py:158-171``).  Spark-first: one
multi-file scan with a pinned schema; lineage comes from
``input_file_name()`` so it is computed executor-side per split — no driver
loop, and the scan parallelizes across however many files/partitions exist.
At 100 TB the same one-liner fans out across the cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TRACKING_RAW


def list_files(path: str) -> list[str]:
    """S1+S2: sorted file names.  Filenames are ``YYYYMMDD-HHMMSSmmm.csv`` so
    lexicographic == chronological (the high-water-mark contract)."""
    return sorted(f for f in os.listdir(path) if f.endswith(".csv"))


def with_file_name(df: DataFrame) -> DataFrame:
    """S4: lineage column = basename of the source file, per row,
    executor-side (vs the reference's driver-side ``df["fileName"] = file``).

    ``__file_pos`` captures scan order (monotonic within each split, splits
    ordered by offset) so "last row in file order" is a total, deterministic
    order — the T3 keep-last dedup uses it as the intra-file tiebreaker.
    Streaming scans can't carry ``monotonically_increasing_id``
    (unsupported expression in a streaming plan) — the streaming
    wirings add it INSIDE ``foreachBatch`` instead, where the frame is
    a batch plan (r11: fileName-only ordering there let intra-file
    duplicate keys pick a nondeterministic survivor).
    """
    out = df.withColumn(
        "fileName", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    if not df.isStreaming:
        out = out.withColumn("__file_pos", F.monotonically_increasing_id())
    return out


def read_tracking_csv(
    spark: SparkSession, paths: str | list[str], *, multiline: bool = False
) -> DataFrame:
    """S3: pinned-schema CSV scan over one path/glob or an explicit file list.

    ``quote``/``escape`` handle event descriptions containing commas,
    quotes and tabs (the reference relies on pandas' default C parser which
    uses the same RFC-4180 double-quote convention).
    """
    reader = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", multiline)
        .schema(TRACKING_RAW)
    )
    if isinstance(paths, str):
        df = reader.csv(paths)
    else:
        df = reader.csv(list(paths))
    return with_file_name(df)
