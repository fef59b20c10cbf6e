"""Streaming pipeline tests: file-source checkpointed ingest (the
reference's incremental contract, built-in) and the windowed Q1 analog."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.sources.parquet_source import load_table
from airflow_postgres_etl_spark.streaming import stream_ingest, windowed_event_counts

from .conftest import SF_SMOKE
from .fixtures.gen_raw import generate


def test_stream_ingest_checkpointed(spark, tmp_path):
    csv_dir = str(tmp_path / "csv")
    generate(csv_dir)
    tr, ev, ck = (str(tmp_path / d) for d in ("tracking", "events", "ckpt"))

    q = stream_ingest(spark, csv_dir, tr, ev, ck)
    q.awaitTermination(120)

    tracking = spark.read.parquet(tr)
    assert tracking.count() == tracking.select("oid__id").distinct().count() > 0
    events = spark.read.parquet(ev)
    assert events.count() > tracking.count()  # ~10 events per tracking

    # restart with no new files: checkpoint (the built-in HWM) skips all
    q2 = stream_ingest(spark, csv_dir, tr, ev, ck)
    q2.awaitTermination(120)
    assert spark.read.parquet(tr).count() == tracking.count()


def test_windowed_counts_match_batch_q1(spark):
    events = load_table(spark, SF_SMOKE, "events")
    streaming_form = windowed_event_counts(events)  # batch df, same plan
    batch_form = (
        events.groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count("*").alias("n_events"))
    )
    a = {(r.minute, r.n_events) for r in streaming_form.collect()}
    b = {(r.minute, r.n_events) for r in batch_form.collect()}
    assert a == b
