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


# ---------------------------------------------------------------------------
# Streaming LOCF time-weighted rollup — the incremental twin of the
# batch `q_time_weighted_avg` (plans/extensions.py): per user, the
# last-observation-carried-forward integral Σ value·Δt accumulates
# across micro-batches from O(1) state per key: (last event's epoch-µs
# and integer-cents value, the running exact-integer Σ v_c·Δt_us and
# Σ Δt_us, the event count).  All arithmetic is int64 — the streamed
# accumulators equal the batch query's BIGINT sums bit-for-bit
# (test-pinned), the one float op is the final division.
#
# Ordering contract: events must arrive in event-time order PER USER
# across batches (true of replayed/partitioned logs; a late event would
# need the integral re-opened — that's the batch backfill path, not
# this operator).  Violations are detected, not absorbed: a batch event
# older than the state's frontier raises, surfacing via q.exception().
# ---------------------------------------------------------------------------

TWA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("span_us", T.LongType()),
        T.StructField("wv", T.LongType()),
        T.StructField("twa", T.DoubleType()),
    ]
)
TWA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_vc", T.LongType()),
        T.StructField("span_us", T.LongType()),
        T.StructField("wv", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _twa_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    last_us, last_vc, span, wv, n = (
        state.get if state.exists else (None, None, 0, 0, 0)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # a NULL value (or ts) reaches pandas as NaN and would silently
        # turn the exact int64 integral into float arithmetic — make it
        # a contract violation like out-of-order arrival instead
        if pdf["v_c"].isna().any() or pdf["t_us"].isna().any():
            raise ValueError(
                f"NULL ts/value for user {key[0]}: the LOCF integral "
                "is exact-integer only — filter or impute upstream"
            )
        pdf = pdf.sort_values(["t_us", "event_id"])
        for t_us, v_c in zip(pdf["t_us"].tolist(), pdf["v_c"].tolist()):
            if last_us is not None:
                if t_us < last_us:
                    raise ValueError(
                        f"out-of-order event for user {key[0]}: "
                        f"{t_us} < frontier {last_us} — late data needs "
                        "the batch backfill path"
                    )
                d = t_us - last_us
                span += d
                wv += last_vc * d
            last_us, last_vc = t_us, v_c
            n += 1
    state.update((last_us, last_vc, span, wv, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "span_us": [span],
            "wv": [wv],
            # float() each exact int first — the int->double rounding then
            # the IEEE divide is exactly the batch twin's CAST+division
            # (a direct int/int true-divide is correctly rounded from the
            # exact rational instead, off by an ulp once wv > 2^53)
            "twa": [
                float(wv) / float(span * 100) if span > 0 else None
            ],
        }
    )


def streaming_time_weighted(events: DataFrame) -> DataFrame:
    """Streaming DataFrame (event_id, ts, user_id, value) → per-user
    running LOCF time-weighted average, state O(1) per user.  The
    epoch-µs and integer-cents projections run JVM-side so the Python
    state function is pure int64 arithmetic (identical rounding to the
    batch twin).  Use with ``outputMode("update")``."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
            F.round(F.col("value") * 100).cast("long").alias("v_c"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _twa_update,
            TWA_OUTPUT_SCHEMA,
            TWA_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


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
