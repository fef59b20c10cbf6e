"""Dynamic partition overwrite + partition pruning
(sources/warehouse.overwrite_partitions): the daily-replay primitive —
replace one day, never touch or list the rest."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.sources.warehouse import (
    overwrite_partitions,
    read_partitioned,
)


def _days_df(spark, rows):
    return spark.createDataFrame(rows, ["day", "k", "v"])


def test_overwrite_replaces_only_present_partitions(spark, tmp_path):
    path = str(tmp_path / "fact")
    overwrite_partitions(
        _days_df(
            spark,
            [("2024-01-01", 1, 10), ("2024-01-02", 2, 20), ("2024-01-03", 3, 30)],
        ),
        path,
        ["day"],
    )
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=2024-01-0[13]/*.parquet")
    }
    assert before
    # replay day 2 only
    overwrite_partitions(
        _days_df(spark, [("2024-01-02", 2, 99), ("2024-01-02", 9, 1)]),
        path,
        ["day"],
    )
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=2024-01-0[13]/*.parquet")
    }
    assert after == before  # untouched partitions byte-for-byte in place
    got = {
        (str(r["day"]), r["k"], r["v"])  # partition values infer as DATE
        for r in read_partitioned(spark, path).collect()
    }
    assert got == {
        ("2024-01-01", 1, 10),
        ("2024-01-02", 2, 99),
        ("2024-01-02", 9, 1),
        ("2024-01-03", 3, 30),
    }


def test_partition_filter_prunes_scan(spark, tmp_path):
    path = str(tmp_path / "fact")
    overwrite_partitions(
        _days_df(
            spark,
            [("2024-01-01", 1, 10), ("2024-01-02", 2, 20), ("2024-01-03", 3, 30)],
        ),
        path,
        ["day"],
    )
    df = read_partitioned(spark, path).filter(F.col("day") == "2024-01-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # inputFiles() reports the unpruned relation; the EXECUTED scan's
    # file set comes from input_file_name() under the filter
    files = [
        r[0] for r in df.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("day=2024-01-02" in f for f in files)
