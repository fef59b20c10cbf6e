"""True Python UDTF (table function) surface: one CDC payload row → N
event rows.

The reference's ``explode`` + ``json_normalize`` (``postgres.py:186-190``)
is a de-facto UDTF; the PRODUCTION path here stays the Arrow parser +
``from_json`` + ``explode_outer`` (``literal_parse.py`` — JVM structs,
whole-stage codegen).  This module exists to cover the UDTF API surface
itself (Spark 4 ``@udtf``): a lateral table function with per-row fan-out,
registered and callable from SQL.  It is a row-at-a-time slow path by
design — never used in the ingest hot path (plan gates assert that), but
tested equivalent to the production parser on the same fixtures.
"""

from __future__ import annotations

import ast
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

EVENT_COLS = (
    "event_created_ms bigint, trackingCode string, status string, "
    "description string, trackerType string, from_loc string, to_loc string"
)


@udtf(returnType=EVENT_COLS)
class ParseEventsUDTF:
    """Yield one row per tracking event parsed from the Python-repr
    payload; malformed payloads yield nothing (PERMISSIVE analog)."""

    def eval(self, payload: str | None) -> Iterator[tuple]:
        if payload is None:
            return
        try:
            events = ast.literal_eval(payload.strip())
        except (ValueError, SyntaxError):
            return
        if not isinstance(events, list):
            return
        for ev in events:
            if not isinstance(ev, dict):
                continue
            created = ev.get("createdAt")
            ms = created.get("$date") if isinstance(created, dict) else None
            yield (
                ms if isinstance(ms, int) else None,
                _s(ev.get("trackingCode")),
                _s(ev.get("status")),
                _s(ev.get("description")),
                _s(ev.get("trackerType")),
                _s(ev.get("from")),
                _s(ev.get("to")),
            )


def _s(v) -> str | None:
    return v if isinstance(v, str) or v is None else str(v)


def register_parse_events_udtf(spark: SparkSession, name: str = "parse_events") -> None:
    """Make the UDTF callable from SQL:
    ``SELECT t.* FROM payloads, LATERAL parse_events(payload) t``."""
    spark.udtf.register(name, ParseEventsUDTF)
