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
