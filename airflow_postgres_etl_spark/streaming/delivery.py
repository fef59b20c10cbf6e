"""Shared delivery-contract helpers for the streaming ingests.

All three corpus-producing streams (document dedup, semantic dedup,
training-corpus) offer the same contract shape: an exactly-once keyed
corpus committed under an epoch txn watermark by default, with an
explicit opt-in back to a plain parquet directory.  The validation, the
writer identity, and the keyed commit live HERE so a contract change is
made once (r10 review finding: three drifting copies).
"""

from __future__ import annotations

import json
import os


def validate_delivery(delivery: str, allowed: tuple[str, ...]) -> bool:
    """Validate the ``delivery=`` knob; returns True for the keyed
    exactly-once mode (always ``allowed[0]``)."""
    if delivery not in allowed:
        raise ValueError(
            f"delivery must be one of {' or '.join(repr(a) for a in allowed)}, "
            f"got {delivery!r}"
        )
    return delivery == "exactly_once"


def stream_txn_app(checkpoint_dir: str) -> str:
    """The writer identity for epoch txn watermarks: the checkpoint
    PATH salted with the checkpoint's own run UUID (Spark stamps one
    into ``<ck>/metadata`` when the checkpoint is created).

    The path alone is NOT a safe identity (r10 review finding): delete
    and recreate a checkpoint at the same path — the standard
    reprocess-everything ops move — and Spark restarts epoch ids at 0
    while the table still carries the OLD incarnation's high watermark,
    so every replayed-plus-new batch below it would silently no-op and
    new rows would be lost.  Salting with the UUID makes a recreated
    checkpoint a NEW writer: its epochs apply from 0 (the dedup indexes
    drop the re-delivered duplicates; a reprocessed training corpus
    re-applies, which is what deleting the checkpoint asks for).

    Falls back to the bare path when the metadata object is unreadable
    (pre-start, or a checkpoint on a filesystem this process cannot
    open) — the pre-r10 behavior, never an error."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as fh:
            qid = json.load(fh).get("id")
        if qid:
            return f"{checkpoint_dir}#{qid}"
    except Exception:
        pass
    return checkpoint_dir


def keyed_corpus_commit(
    rows,
    corpus_out: str,
    key: str,
    checkpoint_dir: str,
    epoch_id: int,
    num_buckets: int | None = None,
) -> None:
    """Commit one epoch's rows into the keyed corpus under the epoch
    txn watermark — the exactly-once leg every stream shares.  A
    replayed epoch (same checkpoint incarnation, same epoch id) is a
    manifest no-op; ``verify_new=False`` because the streams' dedup
    guards (index membership / the watermark itself) own idempotence,
    not per-key verification."""
    from .. import sink

    sink.keyed_append(
        rows.sparkSession,
        rows,
        corpus_out,
        key=key,
        num_buckets=num_buckets,
        verify_new=False,
        txn_app=stream_txn_app(checkpoint_dir),
        txn_seq=int(epoch_id),
    )
