"""True Python UDTF surface: LATERAL table function equal to the
production Arrow parser on the same payloads."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.functions.event_udtf import (
    ParseEventsUDTF,
    register_parse_events_udtf,
)
from airflow_postgres_etl_spark.functions.literal_parse import parse_events

PAYLOADS = [
    (1, "[{'createdAt': {'$date': 1693833000000}, 'trackingCode': 'TC1', "
        "'status': None, 'description': 'posta\tção', 'trackerType': 'x', "
        "'from': 'a', 'to': 'b'}]"),
    (2, "[]"),
    (3, None),
    (4, "not a literal"),
    (5, "[{'createdAt': {'$date': 1693833001000}, 'trackingCode': \"it's\", "
        "'status': 'S', 'description': 'd', 'trackerType': 't', "
        "'from': 'f', 'to': 'g'}, {'createdAt': None, 'trackingCode': 'TC2', "
        "'status': 'S2', 'description': 'd2', 'trackerType': 't2', "
        "'from': 'f2', 'to': 'g2'}]"),
]


def test_udtf_lateral_matches_production_parser(spark):
    df = spark.createDataFrame(PAYLOADS, ["row_id", "payload"])
    df.createOrReplaceTempView("payloads")
    register_parse_events_udtf(spark)

    got = {
        (r.row_id, r.event_created_ms, r.trackingCode, r.status,
         r.description, r.trackerType, r.from_loc, r.to_loc)
        for r in spark.sql(
            "SELECT p.row_id, t.* FROM payloads p, LATERAL parse_events(p.payload) t"
        ).collect()
    }

    prod = (
        df.withColumn("events", parse_events(F.col("payload")))
        .select("row_id", F.explode("events").alias("ev"))
        .select(
            "row_id",
            F.col("ev.createdAt.`$date`").alias("event_created_ms"),
            "ev.trackingCode", "ev.status", "ev.description",
            "ev.trackerType",
            F.col("ev.`from`").alias("from_loc"),
            F.col("ev.`to`").alias("to_loc"),
        )
    )
    exp = {tuple(r) for r in prod.collect()}
    assert got == exp and len(got) == 3  # rows 1 and 5 fan out; 2/3/4 vanish


def test_udtf_direct_call(spark):
    out = ParseEventsUDTF(F.lit(PAYLOADS[0][1])).collect()
    assert len(out) == 1 and out[0].trackingCode == "TC1"
