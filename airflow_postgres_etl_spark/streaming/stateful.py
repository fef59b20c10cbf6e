"""Custom stateful streaming operator via ``applyInPandasWithState``.

Keeps a running per-user event counter across micro-batches — the
arbitrary-state pattern (``flatMapGroupsWithState`` in Scala) for logic
watermark-windowed aggregations can't express.  State is a single
(count, total_value) pair per user key, stored by the state store and
checkpointed; each micro-batch emits the updated running totals for the
users it touched.

Scale: state is partitioned by the grouping key across executors (RocksDB
state store in production); per-batch work is proportional to the batch,
not the state size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, float(total)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame → per-user running (count, sum) updated each
    micro-batch.  Use with ``outputMode("update")``."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Sessionization with EVENT-TIME state expiry — the bounded-state
# pattern.  running_user_totals above keeps state forever (fine for a
# bounded key space); per-session state over an unbounded user space
# MUST expire or the state store grows without limit.  EventTimeTimeout
# ties expiry to the watermark: when the watermark passes an idle
# session's (last event + gap), the state store hands the group back
# with hasTimedOut=True, the final session row is emitted, and the
# state is REMOVED — state size is bounded by the number of sessions
# open inside one watermark horizon, independent of total users seen.
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_GAP_MS = 30 * 60 * 1000


def _session_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    def ms(ts) -> int:
        return int(ts.value // 1_000_000)  # pandas Timestamp -> epoch ms

    def row(start_ms: int, end_ms: int, n: int, closed: bool) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "closed": [closed],
            }
        )

    if state.hasTimedOut:
        start_ms, end_ms, n = state.get
        state.remove()  # the whole point: idle state leaves the store
        yield row(start_ms, end_ms, n, True)
        return

    start_ms, end_ms, n = state.get if state.exists else (None, None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        b_lo, b_hi = ms(pdf["ts"].min()), ms(pdf["ts"].max())
        start_ms = b_lo if start_ms is None else min(start_ms, b_lo)
        end_ms = b_hi if end_ms is None else max(end_ms, b_hi)
        n += len(pdf)
    if start_ms is None:
        return
    state.update((start_ms, end_ms, n))
    state.setTimeoutTimestamp(end_ms + SESSION_GAP_MS)
    yield row(start_ms, end_ms, n, False)


def user_sessions_with_timeout(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming per-user sessions that CLOSE when the event-time
    watermark passes (last event + 30 min): emits ``closed=False``
    running updates while a session is live and one ``closed=True`` row
    when it expires, at which point its state is deleted.  Use with
    ``outputMode("update")``."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
