"""Streaming CDC apply: a ``foreachBatch`` ingest that feeds an
out-of-order change stream through ``sink.apply_changes`` (DLT's
``APPLY CHANGES INTO`` on a file-source stream).

Why no epoch guard is needed here (unlike the CMS leg of
``sketch_stream``): ``apply_changes`` is IDEMPOTENT by construction —
every applied change persists its sequence number in the table's
``__cdc_seq`` column, and a change whose sequence does not EXCEED the
stored one is a counted no-op.  A redelivered micro-batch (crash after
the commit, before the epoch marker; a checkpoint restart replaying the
last trigger) therefore changes nothing: at-least-once file delivery +
sequence-guarded apply = effectively-once table state.  That invariant
is test-pinned in tests/test_cdc.py (restart replay, late stale file).

Per-trigger cost at 100 TB: one window over the micro-batch (net-change
resolution), a bucket-pruned stored-sequence probe over only the
batch's keys' buckets, one O(net-change) MOR delta commit.  The table
is never scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..storage import LOCAL_STORE


def stream_apply_changes(
    spark: SparkSession,
    source_dir: str,
    target: str,
    checkpoint: str,
    schema: str,
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    key: str | None = None,
    num_buckets: int | None = None,
    max_files_per_trigger: int = 10,
    store=LOCAL_STORE,
) -> StreamingQuery:
    """Stream JSON change files from ``source_dir`` into the keyed table
    at ``target`` via ``sink.apply_changes`` (one MOR delta commit per
    micro-batch; see module doc for the replay contract).  ``key`` /
    ``num_buckets`` bootstrap the table on the first non-empty batch."""
    from .. import sink

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        sink.apply_changes(
            spark,
            target,
            batch,
            seq_col,
            op_col=op_col,
            delete_op=delete_op,
            key=key,
            num_buckets=num_buckets,
            store=store,
        )

    return (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_scd2(
    spark: SparkSession,
    source_dir: str,
    target: str,
    checkpoint: str,
    schema: str,
    seq_col: str,
    track_cols: list,
    op_col: str = "op",
    delete_op: str = "D",
    key: str | None = None,
    num_buckets: int | None = None,
    max_files_per_trigger: int = 10,
    store=LOCAL_STORE,
) -> StreamingQuery:
    """Streaming SCD2 maintenance: the change stream feeds
    ``sink.apply_changes_scd2`` per micro-batch, so the keyed HISTORY
    table stays current as changes arrive.  Replay-safe for the same
    reason as :func:`stream_apply_changes`: a redelivered batch
    re-derives a state-identical tail, which the apply detects and
    skips without a commit."""
    from .. import sink

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        sink.apply_changes_scd2(
            spark,
            target,
            batch,
            seq_col,
            list(track_cols),
            op_col=op_col,
            delete_op=delete_op,
            key=key,
            num_buckets=num_buckets,
            store=store,
        )

    return (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
