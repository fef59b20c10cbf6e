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


def test_jsonl_source_pinned_schema_lineage_and_quarantine(spark, tmp_path):
    """JSONL source contract: pinned schema (no inference pass), per-row
    executor-side lineage, malformed lines quarantined — never silently
    dropped — and type mismatches land in quarantine too (PERMISSIVE
    with a corrupt-record column)."""
    from pyspark.sql import types as T

    from airflow_postgres_etl_spark.sources.json_source import (
        list_json_files,
        read_jsonl,
        split_corrupt,
    )

    d = tmp_path / "jsonl"
    d.mkdir()
    (d / "20240102-000000000.jsonl").write_text(
        '{"id": 1, "name": "a"}\n'
        'this line is not json\n'
        '{"id": 3, "name": "c"}\n'
    )
    (d / "20240101-000000000.jsonl").write_text('{"id": 0, "name": "z"}\n')

    assert list_json_files(str(d)) == [
        "20240101-000000000.jsonl",
        "20240102-000000000.jsonl",
    ]

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    df = read_jsonl(spark, str(d), schema)
    good, bad = split_corrupt(df)
    rows = {r.id: r for r in good.collect()}
    assert set(rows) == {0, 1, 3}
    assert rows[0].fileName == "20240101-000000000.jsonl"
    assert rows[1].fileName == "20240102-000000000.jsonl"
    quarantined = bad.collect()
    assert len(quarantined) == 1
    assert quarantined[0]._corrupt_record.startswith("this line")
    assert quarantined[0].fileName == "20240102-000000000.jsonl"

    # predefining the corrupt column is a caller error, not silent shadowing
    import pytest

    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(
            spark,
            str(d),
            T.StructType([T.StructField("_corrupt_record", T.StringType())]),
        )
