"""Commit-protocol tests against BOTH storage implementations.

The sink's crash/concurrency story reduces to one primitive —
replace-the-manifest-if-version-unchanged — isolated behind
``storage.ManifestStore``.  These tests drive the protocol through the
local-FS store AND the fake conditional-PUT store, including the lost
conditional-PUT race a local filesystem can't natively produce: a
competing writer lands its commit at the exact moment between our
snapshot read and our swap, and the store's server-side CAS (not a
client-side re-read) rejects us.
"""

from __future__ import annotations

import os

import pytest

from airflow_postgres_etl_spark.storage import (
    ConcurrentWriteError,
    FakeConditionalStore,
    LocalManifestStore,
)


def _stores(tmp_path):
    return [
        ("local", LocalManifestStore(), str(tmp_path / "local" / "_m.json")),
        ("fake", FakeConditionalStore(), "mem://table/_m.json"),
    ]


def test_read_write_roundtrip_and_absent(tmp_path):
    for name, store, path in _stores(tmp_path):
        assert store.read_json(path) is None, name
        store.write_json(path, {"version": 1, "buckets": {"0": ["a.parquet"]}})
        got = store.read_json(path)
        assert got == {"version": 1, "buckets": {"0": ["a.parquet"]}}, name
        # reads are snapshots, not aliases: mutating the returned dict
        # must not corrupt the store
        got["version"] = 99
        assert store.read_json(path)["version"] == 1, name


def test_initial_commit_then_versioned_replace(tmp_path):
    for name, store, path in _stores(tmp_path):
        store.replace_if_version(path, {"version": 1, "buckets": {}}, None)
        store.replace_if_version(path, {"version": 2, "buckets": {}}, 1)
        assert store.read_json(path)["version"] == 2, name


def test_stale_writer_is_rejected(tmp_path):
    """Writer B snapshots v1, writer A commits v2; B's conditional
    replace must fail and leave A's commit untouched."""
    for name, store, path in _stores(tmp_path):
        store.replace_if_version(path, {"version": 1, "buckets": {"0": ["a"]}}, None)
        # A commits from the same snapshot first
        store.replace_if_version(path, {"version": 2, "buckets": {"0": ["b"]}}, 1)
        with pytest.raises(ConcurrentWriteError):
            store.replace_if_version(path, {"version": 2, "buckets": {"0": ["c"]}}, 1)
        assert store.read_json(path)["buckets"] == {"0": ["b"]}, name


def test_lost_conditional_put_race():
    """The race the fake store exists for: the competing commit lands
    INSIDE our replace call (after we decided to commit, before the CAS
    evaluates) — exactly a lost conditional PUT on S3/GCS.  The CAS must
    reject us atomically; no torn or interleaved state."""
    store = FakeConditionalStore()
    path = "mem://t/_m.json"
    store.replace_if_version(path, {"version": 1, "buckets": {"0": ["a"]}}, None)

    def competing_commit():
        store.replace_if_version(path, {"version": 2, "buckets": {"0": ["theirs"]}}, 1)

    store.on_replace = competing_commit
    with pytest.raises(ConcurrentWriteError):
        store.replace_if_version(path, {"version": 2, "buckets": {"0": ["ours"]}}, 1)
    assert store.read_json(path) == {"version": 2, "buckets": {"0": ["theirs"]}}


def test_local_replace_is_atomic_no_tmp_residue(tmp_path):
    store = LocalManifestStore()
    path = str(tmp_path / "t" / "_m.json")
    os.makedirs(os.path.dirname(path))
    store.replace_if_version(path, {"version": 1}, None)
    store.replace_if_version(path, {"version": 2}, 1)
    residue = [f for f in os.listdir(os.path.dirname(path)) if f.endswith(".tmp")]
    assert residue == []


def test_sink_commit_protocol_runs_on_fake_store(spark, tmp_path):
    """The sink's merge commits through an injected store: data files go
    to the local path (Spark's writer), but every manifest/spec object
    lives ONLY in the fake conditional-PUT store — proof the protocol
    itself has no hidden filesystem dependency."""
    from airflow_postgres_etl_spark.sink import (
        keyed_overwrite_parquet,
        read_keyed_table,
        table_version,
    )

    store = FakeConditionalStore()
    target = str(tmp_path / "t")
    base = spark.createDataFrame([("a", 1), ("b", 2)], ["oid__id", "v"])
    keyed_overwrite_parquet(spark, base, target, num_buckets=4, store=store)
    batch = spark.createDataFrame([("a", 9)], ["oid__id", "v"])
    keyed_overwrite_parquet(spark, batch, target, num_buckets=4, store=store)

    # no _manifest.json / _bucket_spec.json on the local filesystem
    assert not os.path.exists(os.path.join(target, "_manifest.json"))
    assert not os.path.exists(os.path.join(target, "_bucket_spec.json"))
    assert table_version(target, store=store) == 2
    got = {(r.oid__id, r.v) for r in read_keyed_table(spark, target, store=store).collect()}
    assert got == {("a", 9), ("b", 2)}
    # and reading through the DEFAULT (local) store finds nothing
    with pytest.raises(FileNotFoundError):
        read_keyed_table(spark, target)
