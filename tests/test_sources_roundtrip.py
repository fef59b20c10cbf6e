"""Source-format coverage: JSON and CSV round-trips with pinned schemas
(no inference in prod paths), ORC write/read."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.sources.parquet_source import load_table

from .conftest import SF_SMOKE


def _events(spark):
    return load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


def test_json_roundtrip(spark, tmp_path):
    src = _events(spark)
    path = str(tmp_path / "ev_json")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert back.count() == src.count()
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0


def test_csv_roundtrip(spark, tmp_path):
    src = _events(spark)
    path = str(tmp_path / "ev_csv")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(src.schema).option("header", True).csv(path)
    assert back.exceptAll(src).count() == 0


def test_orc_roundtrip(spark, tmp_path):
    src = _events(spark)
    path = str(tmp_path / "ev_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.exceptAll(src).count() == 0


def test_partitioned_parquet_prunes(spark, tmp_path):
    src = _events(spark)
    path = str(tmp_path / "ev_part")
    src.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    # partition pruning: the filter becomes a PartitionFilter, not a scan filter
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "event_type" in pf_line
    assert back.count() == src.filter(F.col("event_type") == "click").count()
