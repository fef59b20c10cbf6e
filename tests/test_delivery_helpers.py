"""Unit tests for the shared streaming delivery helpers
(streaming/delivery.py) — the validation knob and the checkpoint-
incarnation writer identity (r10)."""

from __future__ import annotations

import json
import os

import pytest

from airflow_postgres_etl_spark.streaming.delivery import (
    CheckpointIdentityError,
    reset_stream_identity_cache,
    stream_txn_app,
    validate_delivery,
)


def test_validate_delivery_contract():
    assert validate_delivery("exactly_once", ("exactly_once", "at_most_once"))
    assert not validate_delivery(
        "at_most_once", ("exactly_once", "at_most_once")
    )
    assert not validate_delivery(
        "at_least_once", ("exactly_once", "at_least_once")
    )
    with pytest.raises(ValueError, match="delivery must be"):
        validate_delivery("at_least_once", ("exactly_once", "at_most_once"))
    with pytest.raises(ValueError, match="delivery must be"):
        validate_delivery("", ("exactly_once", "at_most_once"))


def test_stream_txn_app_salts_with_run_uuid(tmp_path):
    reset_stream_identity_cache()
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    # pre-start (no metadata yet, nothing resolved): path fallback
    assert stream_txn_app(ck) == ck
    with open(os.path.join(ck, "metadata"), "w") as fh:
        json.dump({"id": "run-uuid-1"}, fh)
    assert stream_txn_app(ck) == f"{ck}#run-uuid-1"
    # a RECREATED checkpoint gets a new uuid -> a new writer identity
    with open(os.path.join(ck, "metadata"), "w") as fh:
        json.dump({"id": "run-uuid-2"}, fh)
    assert stream_txn_app(ck) == f"{ck}#run-uuid-2"


def test_stream_txn_app_identity_stable_within_incarnation(tmp_path):
    """r10 ADVICE finding 1 + r11 review: a transient/corrupt metadata
    READ returns the SAME cached identity (no flip between a commit and
    its replay), but metadata observed ABSENT is authoritative deletion
    — it purges the cache, so a recreated checkpoint can never inherit
    the old incarnation's identity through a later failed read (the
    silent-loss window: stale identity -> old watermark no-ops the new
    epoch)."""
    reset_stream_identity_cache()
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    meta = os.path.join(ck, "metadata")
    with open(meta, "w") as fh:
        json.dump({"id": "run-uuid-1"}, fh)
    ident = stream_txn_app(ck)
    assert ident == f"{ck}#run-uuid-1"
    # corrupt read mid-incarnation: cached identity, never the bare path
    with open(meta, "w") as fh:
        fh.write("not json")
    assert stream_txn_app(ck) == ident
    # metadata observed ABSENT with an identity resolved: the
    # checkpoint was deleted under this LIVE stream — fail loudly
    # (the stale identity would silently DROP the recreated
    # incarnation's epochs; the shared bare path accumulates its own
    # watermark across deletions) and purge the cache
    os.remove(meta)
    with pytest.raises(CheckpointIdentityError, match="deleted"):
        stream_txn_app(ck)
    # ...and a corrupt read right after recreation also fails LOUDLY
    # instead of resurrecting run-uuid-1 (cache was purged)
    with open(meta, "w") as fh:
        fh.write("not json")
    with pytest.raises(CheckpointIdentityError):
        stream_txn_app(ck)
    # the recreated checkpoint's healthy read resolves the NEW uuid
    with open(meta, "w") as fh:
        json.dump({"id": "run-uuid-2"}, fh)
    assert stream_txn_app(ck) == f"{ck}#run-uuid-2"


def test_stream_txn_app_raises_on_unreadable_first_read(tmp_path):
    """r10 ADVICE finding 1: metadata present but unreadable with NO
    previously-resolved identity -> hard error, never a silent bare-path
    fallback (that fallback is exactly the identity flip the salt was
    built to prevent)."""
    reset_stream_identity_cache()
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    with open(os.path.join(ck, "metadata"), "w") as fh:
        fh.write("not json")
    with pytest.raises(CheckpointIdentityError, match="Refusing to guess"):
        stream_txn_app(ck)
    # metadata with no query id is just as unreadable
    reset_stream_identity_cache()
    with open(os.path.join(ck, "metadata"), "w") as fh:
        json.dump({"not_id": 1}, fh)
    with pytest.raises(CheckpointIdentityError):
        stream_txn_app(ck)

def test_guard_keyed_bootstrap_refuses_plain_parquet_corpus(tmp_path):
    """r10 ADVICE finding 3: a pre-exactly-once stream left loose
    parquet at corpus_out; restarting under the keyed DEFAULT must fail
    at wiring time with both ways out, not silently orphan the rows."""
    from airflow_postgres_etl_spark.streaming.delivery import (
        guard_keyed_bootstrap,
    )

    out = str(tmp_path / "corpus")
    # missing or empty directory: a genuine bootstrap, no complaint
    guard_keyed_bootstrap(out, "stream_x")
    os.makedirs(out)
    guard_keyed_bootstrap(out, "stream_x")
    # loose part file, no manifest -> the pre-r10 plain-parquet shape
    open(os.path.join(out, "part-00000.snappy.parquet"), "w").close()
    with pytest.raises(ValueError, match="at_most_once.*migrate|migrate"):
        guard_keyed_bootstrap(out, "stream_x")
    # an existing KEYED table passes even with stray root-level parquet
    from airflow_postgres_etl_spark import sink
    from airflow_postgres_etl_spark.storage import LOCAL_STORE

    LOCAL_STORE.write_json(
        sink._manifest_path(out), {"version": 0, "buckets": {}}
    )
    guard_keyed_bootstrap(out, "stream_x")
    # a pre-manifest BUCKET layout is adoptable, not loose -> passes
    out2 = str(tmp_path / "corpus2")
    os.makedirs(os.path.join(out2, "bucket=0"))
    open(os.path.join(out2, "bucket=0", "f.parquet"), "w").close()
    guard_keyed_bootstrap(out2, "stream_x")

def test_stream_txn_app_reads_via_hadoop_fs(tmp_path, spark):
    """With a session in hand the metadata read goes through the
    checkpoint path's own Hadoop filesystem (the FS Spark writes the
    checkpoint through), so HDFS/S3 checkpoints resolve exactly like
    this local one — never a raw open() that only sees the local leg."""
    reset_stream_identity_cache()
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    # pre-start through the FS API: no metadata object yet
    assert stream_txn_app(ck, spark) == ck
    with open(os.path.join(ck, "metadata"), "w") as fh:
        json.dump({"id": "run-uuid-fs"}, fh)
    assert stream_txn_app(ck, spark) == f"{ck}#run-uuid-fs"


def test_stream_txn_app_commit_path_requires_salted(tmp_path):
    """r11 review: the COMMIT path (require_salted=True, what
    keyed_corpus_commit passes) must NEVER fall back to the shared
    bare-path identity — a fresh driver process (empty cache) resuming
    a checkpoint that was deleted before its first commit would
    otherwise commit epoch N under the bare path, whose accumulated
    watermark can silently no-op it.  Probes (default) keep the
    pre-start bare-path behavior."""
    reset_stream_identity_cache()
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    with pytest.raises(CheckpointIdentityError, match="no metadata"):
        stream_txn_app(ck, require_salted=True)
    # ...and the raise is not one-shot: still loud on retry
    with pytest.raises(CheckpointIdentityError, match="no metadata"):
        stream_txn_app(ck, require_salted=True)
    assert stream_txn_app(ck) == ck  # probe path unchanged
    with open(os.path.join(ck, "metadata"), "w") as fh:
        json.dump({"id": "u1"}, fh)
    assert stream_txn_app(ck, require_salted=True) == f"{ck}#u1"
