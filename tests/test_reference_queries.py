"""Differential test of the reference's literal declared queries
(README.md:267-320) over REAL ingest output: raw CSV fixture → ingest →
parquet mirrors → Spark DataFrame form vs DuckDB SQL on the same mirrors."""

from __future__ import annotations

import duckdb
import pytest

from airflow_postgres_etl_spark.pipeline import incremental_load, load_outputs
from airflow_postgres_etl_spark.plans import reference_queries as RQ

from .fixtures.gen_raw import generate
from .oracle_utils import compare


@pytest.fixture(scope="module")
def loaded(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("refq")
    csv_dir = str(root / "csv")
    generate(csv_dir)
    tr, ev = str(root / "tracking"), str(root / "events")
    incremental_load(spark, csv_dir, tr, ev)
    tracking, events = load_outputs(spark, tr, ev)
    return tracking, events, tr, ev


def oracle(sql: str, tr: str, ev: str):
    # hive_partitioning=false keeps the internal __bucket partition dirs of
    # the keyed-overwrite sink out of the oracle's logical schema, matching
    # read_keyed_table on the Spark side.
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        con.execute(
            "CREATE VIEW tracking AS SELECT * FROM "
            f"read_parquet('{tr}/**/*.parquet', hive_partitioning=false)"
        )
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{ev}/**/*.parquet', hive_partitioning=false)"
        )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def diff(spark_df, oracle_df):
    compare(spark_df, oracle_df)


def test_q1_trackings_per_minute(spark, loaded):
    tracking, _, tr, ev = loaded
    diff(
        RQ.q1_trackings_per_minute(tracking),
        oracle(
            """
            SELECT date_trunc('minute', "createdAt") AS minute, count(*) AS count
            FROM tracking GROUP BY 1 ORDER BY 1 LIMIT 1000
            """,
            tr, ev,
        ),
    )


def test_q2_events_per_tracking_code(spark, loaded):
    _, events, tr, ev = loaded
    diff(
        RQ.q2_events_per_tracking_code(events),
        oracle(
            """
            SELECT "trackingCode", count(*) AS count FROM events
            GROUP BY 1 ORDER BY count DESC, "trackingCode" LIMIT 1000
            """,
            tr, ev,
        ),
    )


def test_q3_top10_descriptions(spark, loaded):
    _, events, tr, ev = loaded
    diff(
        RQ.q3_top10_descriptions(events),
        oracle(
            """
            WITH c AS (
                SELECT description, count(*) AS total_events
                FROM events GROUP BY description
            )
            SELECT description, total_events,
                   rank() OVER (ORDER BY total_events DESC) AS event_rank
            FROM c
            QUALIFY event_rank <= 10
            ORDER BY event_rank, description
            """,
            tr, ev,
        ),
    )


def test_q4_join_counts(spark, loaded):
    tracking, events, tr, ev = loaded
    diff(
        RQ.q4_tracking_with_events(tracking, events),
        oracle(
            """
            SELECT t."oid__id", t."Op", count(e."trackingCode") AS n_events
            FROM tracking t
            LEFT JOIN (SELECT * FROM events WHERE "trackingCode" IS NOT NULL) e
              ON t."oid__id" = e."oid__id"
            GROUP BY 1, 2
            """,
            tr, ev,
        ),
    )
