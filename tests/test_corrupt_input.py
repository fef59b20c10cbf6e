"""Malformed-input behavior of the pinned-schema CSV scan: the reference
(pandas ``read_csv`` + ``eval``) crashes or silently mis-parses; here bad
cells become NULLs (PERMISSIVE mode) and bad payloads parse to NULL arrays
that outer-explode into NULL-event rows — the load never dies mid-batch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators.ingest import build_events, build_tracking
from airflow_postgres_etl_spark.sources.csv_source import read_tracking_csv

HEADER = "Op,oid__id,createdAt,updatedAt,lastSyncTracker,array_trackingEvents"


def write_csv(path: str, rows: list[str]) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(HEADER + "\n")
        for r in rows:
            fh.write(r + "\n")


def test_corrupt_rows_become_nulls_not_failures(spark, tmp_path):
    good = 'U,aaaa,1693000000,1693000100,1693000000,"[{\'createdAt\': {\'$date\': 1693000000000}, \'trackingCode\': \'tc\', \'status\': None, \'description\': \'ok\', \'trackerType\': \'t\', \'from\': \'f\', \'to\': \'t2\'}]"'
    bad_epoch = "U,bbbb,not_a_number,1693000100,1693000000,[]"
    bad_payload = "U,cccc,1693000000,1693000100,1693000000,<<<garbage>>>"
    short_row = "U,dddd"
    write_csv(str(tmp_path / "20230910-000000000.csv"),
              [good, bad_epoch, bad_payload, short_row])

    raw = read_tracking_csv(spark, str(tmp_path) + "/*.csv")
    rows = {r.oid__id: r for r in raw.collect()}
    assert len(rows) == 4                      # no row lost
    assert rows["bbbb"].createdAt is None      # bad epoch -> NULL cell
    assert rows["dddd"].updatedAt is None      # short row -> NULL tail

    tracking = build_tracking(raw)
    assert tracking.count() == 4

    events = build_events(raw)
    by_id: dict[str, list] = {}
    for r in events.collect():
        by_id.setdefault(r["oid__id"], []).append(r)
    assert by_id["aaaa"][0]["description"] == "ok"
    # garbage payload -> NULL-event row survives (outer explode), not a crash
    assert len(by_id["cccc"]) == 1 and by_id["cccc"][0]["trackingCode"] is None
    assert len(by_id["dddd"]) == 1 and by_id["dddd"][0]["trackingCode"] is None


def test_corrupt_payload_same_in_both_parse_modes(spark, tmp_path):
    write_csv(
        str(tmp_path / "20230911-000000000.csv"),
        ["U,x1,1693000000,1693000100,1693000000,not a list",
         "U,x2,1693000000,1693000100,1693000000,[]"],
    )
    raw = read_tracking_csv(spark, str(tmp_path) + "/*.csv")
    for mode in ("safe", "auto"):
        ev = build_events(raw, parse_mode=mode)
        got = {(r.oid__id, r.trackingCode) for r in ev.collect()}
        assert got == {("x1", None), ("x2", None)}, f"mode={mode}"
