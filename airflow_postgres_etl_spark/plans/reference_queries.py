"""The reference's own declared test queries (``README.md:267-320``) in
DataFrame form, over the ingested ``tracking``/``events`` tables — the
literal analytical surface a reference user runs today.

The driver's oracle gate runs the testdata analogs (``plans/queries.py``
Q1–Q4); these run against real ingest output and are differential-tested in
``tests/test_reference_queries.py`` on the raw-CSV fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def q1_trackings_per_minute(tracking: DataFrame, limit: int = 1000) -> DataFrame:
    """README.md:267-280 — trackings created per minute."""
    return (
        tracking.groupBy(
            F.date_trunc("minute", F.col("createdAt")).alias("minute")
        )
        .agg(F.count("*").alias("count"))
        .orderBy("minute")
        .limit(limit)
    )


def q2_events_per_tracking_code(events: DataFrame, limit: int = 1000) -> DataFrame:
    """README.md:283-295 — events per tracking code, most active first."""
    return (
        events.groupBy("trackingCode")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("trackingCode"))
        .limit(limit)
    )


def q3_top10_descriptions(events: DataFrame) -> DataFrame:
    """README.md:299-320 — top-10 event descriptions by rank (ties share
    rank, QUALIFY-style filter)."""
    counts = events.groupBy("description").agg(
        F.count("*").alias("total_events")
    )
    w = Window.orderBy(F.desc("total_events"))
    return (
        counts.withColumn("event_rank", F.rank().over(w))
        .filter(F.col("event_rank") <= 10)
        .orderBy("event_rank", "description")
    )


def q4_tracking_with_events(tracking: DataFrame, events: DataFrame) -> DataFrame:
    """README.md:99 (implied FK join) — parent rows with child-event counts;
    left join preserves trackings whose event array was empty."""
    ev = events.filter(F.col("trackingCode").isNotNull())
    return (
        tracking.join(ev.select("oid__id", "trackingCode"), "oid__id", "left")
        .groupBy("oid__id", "Op")
        .agg(F.count("trackingCode").alias("n_events"))
    )
