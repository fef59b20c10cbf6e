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


class CheckpointIdentityError(RuntimeError):
    """The checkpoint's ``metadata`` object exists but could not be
    read/parsed, and no identity for this checkpoint has been resolved
    yet — committing under a guessed identity could silently duplicate
    or drop epochs, so the stream must fail loudly instead."""


#: checkpoint dir -> last successfully-resolved salted identity.  The
#: cache is what keeps the identity STABLE within one checkpoint
#: incarnation: a transient metadata-read failure between a commit and
#:  its replay returns the cached identity instead of flipping to a
#: different writer (which would turn the watermark no-op into a silent
#: duplicate keyed_append — r10 ADVICE finding 1).  A successful read
#: always refreshes the entry, so a checkpoint RECREATED at the same
#: path (new run UUID) still becomes a new writer.  Driver-side only:
#: foreachBatch runs on the driver, so one process owns the stream.
_IDENTITY_CACHE: dict[str, str] = {}


def reset_stream_identity_cache() -> None:
    """Test hook: forget all resolved identities (a fresh driver)."""
    _IDENTITY_CACHE.clear()


def _read_checkpoint_metadata(checkpoint_dir: str, spark=None):
    """``(exists, query_id)`` from ``<checkpoint>/metadata``.

    With a live session the bytes come through the checkpoint path's
    own Hadoop filesystem — the same FS Spark writes the checkpoint
    through — so HDFS/S3 checkpoints resolve exactly like local ones
    (r10 ADVICE finding 1: a raw ``open()`` can only ever see the local
    leg, so on object-store checkpoints the salt silently never
    applied).  Raises on a present-but-unreadable object; returns
    ``(False, None)`` only when the object genuinely does not exist."""
    path = checkpoint_dir.rstrip("/") + "/metadata"
    if spark is not None:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        if not fs.exists(jpath):
            return False, None
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(fs.open(jpath), "UTF-8")
        )
        try:
            chunks = []
            line = reader.readLine()
            while line is not None:
                chunks.append(line)
                line = reader.readLine()
        finally:
            reader.close()
        return True, json.loads("\n".join(chunks))["id"]
    # no session in hand (unit tests, pre-wiring probes): local leg only
    if not os.path.exists(path):
        return False, None
    with open(path) as fh:
        return True, json.load(fh)["id"]


def stream_txn_app(
    checkpoint_dir: str, spark=None, *, require_salted: bool = False
) -> str:
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

    Resolution contract (r10 ADVICE finding 1):

    - metadata readable -> salted identity, cached (a later successful
      read with a NEW uuid refreshes it — recreated checkpoint).
    - metadata OBSERVED ABSENT: with ``require_salted=True`` (the
      COMMIT path — ``keyed_corpus_commit``) this always purges the
      cache and raises: Spark writes the metadata object at query
      start, before epoch 0, so absent-at-commit-time can only mean
      the checkpoint was deleted under a live stream, and NO identity
      is safe there — the stale cached one lets a recreated
      checkpoint's early epochs no-op against the old watermark
      (silent loss), and the shared bare path accumulates its own
      watermark across every such deletion, so a second
      delete-under-live with a lower epoch id would also silently
      no-op (r11 review; the raise is not gated on the cache, which is
      per-process and empty after a driver restart).  Without
      ``require_salted`` (pre-start probes, tests): bare path when
      nothing is cached, the same loud raise when an identity had been
      resolved.
    - read FAILS or parses without an id: return the CACHED identity if
      one exists (stability within the incarnation beats one lost
      probe), else raise :class:`CheckpointIdentityError` — silently
      falling back to the bare path is exactly the identity flip the
      salt was built to prevent."""
    cached = _IDENTITY_CACHE.get(checkpoint_dir)
    try:
        exists, qid = _read_checkpoint_metadata(checkpoint_dir, spark)
        if exists and not qid:
            raise ValueError("checkpoint metadata has no query id")
    except Exception as exc:
        if cached is not None:
            return cached
        raise CheckpointIdentityError(
            f"cannot resolve the writer identity for checkpoint "
            f"{checkpoint_dir!r}: its metadata object is present but "
            f"unreadable ({exc}).  Refusing to guess — a wrong identity "
            "silently duplicates or drops epochs."
        ) from exc
    if not exists:
        if cached is None and not require_salted:
            return checkpoint_dir
        _IDENTITY_CACHE.pop(checkpoint_dir, None)
        raise CheckpointIdentityError(
            f"checkpoint {checkpoint_dir!r} has no metadata object "
            "(deleted under a live stream — Spark writes it at query "
            "start, before any epoch).  Refusing to commit this epoch "
            "— restart the stream against the recreated checkpoint; "
            "committing under a stale or shared identity can silently "
            "drop rows below an old watermark."
        )
    ident = f"{checkpoint_dir}#{qid}"
    _IDENTITY_CACHE[checkpoint_dir] = ident
    return ident


def guard_keyed_bootstrap(corpus_out: str, stream_name: str) -> None:
    """Refuse to bootstrap a keyed corpus ON TOP of a plain-parquet one
    (r10 ADVICE finding 3).

    A pre-r10 stream wrote a bare parquet directory; restarted under the
    r10 ``delivery="exactly_once"`` DEFAULT with no manifest present,
    ``keyed_append`` would bootstrap a keyed table in the same directory
    and the pre-existing loose part files would become invisible to
    ``read_keyed_table`` — and never re-admitted, because the dedup
    index still holds their doc ids.  Detect that exact shape (loose
    ``*.parquet`` at the corpus root, no adoptable manifest) at stream
    START and fail with the two ways out.  Runs once per stream wiring;
    both probes go through the storage seam."""
    from .. import sink
    from ..storage import LOCAL_STORE

    if sink._load_manifest(corpus_out, store=LOCAL_STORE) is not None:
        return
    loose = [
        n for n in LOCAL_STORE.list_dir(corpus_out) if n.endswith(".parquet")
    ]
    if loose:
        raise ValueError(
            f"{stream_name}: corpus_out {corpus_out!r} holds "
            f"{len(loose)} loose parquet file(s) but no keyed-table "
            "manifest — it was written by a plain-parquet "
            "(pre-exactly-once) run of this stream.  Bootstrapping the "
            "keyed corpus here would orphan those rows (invisible to "
            "read_keyed_table, never re-admitted past the dedup index). "
            "Either restart with delivery='at_most_once'/'at_least_once' "
            "to keep appending plain parquet, or migrate once: read the "
            "directory with spark.read.parquet and sink.keyed_append it "
            "into a NEW corpus directory, then point the stream there."
        )


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

    spark = rows.sparkSession
    sink.keyed_append(
        spark,
        rows,
        corpus_out,
        key=key,
        num_buckets=num_buckets,
        verify_new=False,
        txn_app=stream_txn_app(checkpoint_dir, spark, require_salted=True),
        txn_seq=int(epoch_id),
    )
