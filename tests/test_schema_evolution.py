"""Type-level schema evolution on the keyed table: implicit lossless
upcasts of narrow batches, loud write-time rejection of conflicts (which
previously surfaced as a cryptic parquet mergeSchema failure at READ
time), and widen_keyed_table for the table-side move."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airflow_postgres_etl_spark.sink import (
    keyed_merge_mor,
    keyed_overwrite_parquet,
    lookup_keys,
    read_keyed_table,
    table_delta_depth,
    table_version,
    widen_keyed_table,
)


def _df(spark, rows, v_type=LongType(), key_type=StringType()):
    schema = StructType(
        [StructField("oid__id", key_type), StructField("v", v_type)]
    )
    return spark.createDataFrame(rows, schema)


def test_narrow_batch_upcasts_into_wide_table(spark, tmp_path):
    """int batch into a bigint column: implicit lossless upcast, for
    both the CoW and MOR write paths; schema stays bigint."""
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark, _df(spark, [("a", 1), ("b", 2)]), target, num_buckets=2
    )
    narrow = _df(spark, [("a", 10)], v_type=IntegerType())
    keyed_overwrite_parquet(spark, narrow, target, num_buckets=2)
    keyed_merge_mor(
        spark, _df(spark, [("c", 3)], v_type=IntegerType()), target, num_buckets=2
    )
    df = read_keyed_table(spark, target)
    assert dict(df.dtypes)["v"] == "bigint"
    assert {(r.oid__id, r.v) for r in df.collect()} == {
        ("a", 10),
        ("b", 2),
        ("c", 3),
    }


def test_wide_batch_rejected_pointing_at_widen(spark, tmp_path):
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark,
        _df(spark, [("a", 1)], v_type=IntegerType()),
        target,
        num_buckets=2,
    )
    with pytest.raises(ValueError, match="widen_keyed_table"):
        keyed_overwrite_parquet(
            spark, _df(spark, [("b", 2)]), target, num_buckets=2
        )
    with pytest.raises(ValueError, match="widen_keyed_table"):
        keyed_merge_mor(spark, _df(spark, [("b", 2)]), target, num_buckets=2)


def test_incompatible_type_rejected_loudly(spark, tmp_path):
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark, _df(spark, [("a", 1)]), target, num_buckets=2
    )
    bad = spark.createDataFrame([("b", "oops")], ["oid__id", "v"])
    with pytest.raises(ValueError, match="no lossless conversion"):
        keyed_overwrite_parquet(spark, bad, target, num_buckets=2)
    assert table_version(target) == 1  # nothing committed


def test_drifted_batch_into_untouched_buckets_still_aligned(spark, tmp_path):
    """The reconciliation edge: a narrow batch whose keys hash to
    buckets with NO existing files must still upcast (otherwise the
    drifted file poisons a later full-table mergeSchema read)."""
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark, _df(spark, [("a", 1)]), target, num_buckets=16
    )
    wide = _df(
        spark, [(f"k{i}", i) for i in range(30)], v_type=IntegerType()
    )
    keyed_overwrite_parquet(spark, wide, target, num_buckets=16)
    df = read_keyed_table(spark, target)  # would raise on footer conflict
    assert dict(df.dtypes)["v"] == "bigint"
    assert df.count() == 31


def test_widen_keyed_table_value_column(spark, tmp_path):
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark,
        _df(spark, [("a", 1), ("b", 2)], v_type=IntegerType()),
        target,
        num_buckets=2,
        stats_cols=["v"],
    )
    before = {(r.oid__id, r.v) for r in read_keyed_table(spark, target).collect()}
    widen_keyed_table(spark, target, {"v": "bigint"})
    df = read_keyed_table(spark, target)
    assert dict(df.dtypes)["v"] == "bigint"
    assert {(r.oid__id, r.v) for r in df.collect()} == before
    # the wide batch now merges fine
    keyed_overwrite_parquet(spark, _df(spark, [("c", 2**40)]), target, num_buckets=2)
    assert read_keyed_table(spark, target).filter("v > 1000000").count() == 1
    # data-skipping stats survived the rewrite (recomputed for 'v')
    got = read_keyed_table(spark, target, where=("v", 2**40, None))
    assert {r.oid__id for r in got.collect()} == {"c"}


def test_widen_key_column_rehashes_buckets(spark, tmp_path):
    """Widening the KEY changes its xxhash64 — the rewrite must re-route
    every row into its new-bucket home or pruned reads go blind."""
    target = str(tmp_path / "t")
    df = _df(
        spark,
        [(i, i * 10) for i in range(20)],
        v_type=LongType(),
        key_type=IntegerType(),
    )
    keyed_overwrite_parquet(spark, df, target, num_buckets=8)
    widen_keyed_table(spark, target, {"oid__id": "bigint"})
    out = read_keyed_table(spark, target)
    assert dict(out.dtypes)["oid__id"] == "bigint"
    assert out.count() == 20
    # bucket-pruned point lookup (hashes with the NEW type) still finds keys
    assert {r.oid__id for r in lookup_keys(spark, target, [3, 7]).collect()} == {3, 7}
    # and a bigint-keyed merge lands in the right buckets
    big = _df(spark, [(3, 999)], v_type=LongType(), key_type=LongType())
    keyed_overwrite_parquet(spark, big, target, num_buckets=8)
    assert {
        r.v for r in lookup_keys(spark, target, [3]).collect()
    } == {999}


def test_widen_resolves_pending_deltas(spark, tmp_path):
    """A widen over a dirty table folds MOR deltas (it's a full rewrite)
    and keeps precedence-resolved content."""
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(
        spark,
        _df(spark, [("a", 1), ("b", 2)], v_type=IntegerType()),
        target,
        num_buckets=2,
    )
    keyed_merge_mor(
        spark,
        _df(spark, [("a", 7)], v_type=IntegerType()),
        target,
        num_buckets=2,
    )
    assert table_delta_depth(target) == 1
    widen_keyed_table(spark, target, {"v": "bigint"})
    assert table_delta_depth(target) == 0
    assert {
        (r.oid__id, r.v) for r in read_keyed_table(spark, target).collect()
    } == {("a", 7), ("b", 2)}


def test_widen_rejects_non_lossless(spark, tmp_path):
    target = str(tmp_path / "t")
    keyed_overwrite_parquet(spark, _df(spark, [("a", 1)]), target, num_buckets=2)
    with pytest.raises(ValueError, match="not a lossless"):
        widen_keyed_table(spark, target, {"v": "int"})  # narrowing
    with pytest.raises(ValueError, match="no column"):
        widen_keyed_table(spark, target, {"nope": "bigint"})


def test_nullability_only_difference_is_not_a_type_conflict(spark, tmp_path):
    """collect_list yields array<bigint> containsNull=false; the same
    column read back from parquet is containsNull=true.  A re-merge of
    a derived batch must treat that as the SAME type (metadata-only
    cast), not "no lossless conversion"."""
    from pyspark.sql import functions as F

    from airflow_postgres_etl_spark.sink import (
        keyed_overwrite_parquet,
        read_keyed_table,
    )

    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3])], "oid__id string, xs array<bigint>"
    )
    keyed_overwrite_parquet(spark, base, target, num_buckets=2)
    # batch built by an aggregate: containsNull=false flavor
    batch = (
        spark.createDataFrame([("a", 9), ("a", 8)], "oid__id string, v long")
        .groupBy("oid__id")
        .agg(F.sort_array(F.collect_list("v")).alias("xs"))
    )
    assert not batch.schema["xs"].dataType.containsNull
    keyed_overwrite_parquet(spark, batch, target, num_buckets=2)
    got = {(r.oid__id, tuple(r.xs)) for r in read_keyed_table(spark, target).collect()}
    assert got == {("a", (8, 9)), ("b", (3,))}


# ---------------------------------------------------------------------------
# Column mapping: metadata-only RENAME/DROP COLUMN.  Files keep physical
# names forever; the manifest mapping relabels at the read/write
# boundary.  The invariants: renames are one commit with zero data
# moves, every write surface speaks logical names afterwards, time
# travel / restore are version-exact about names, dropped names cannot
# resurrect, non-mapping-aware ops fail closed until a purge, and the
# purge physicalizes bit-exactly.
# ---------------------------------------------------------------------------


def _cm_table(spark, tmp_path, n=40):
    from airflow_postgres_etl_spark.sink import keyed_overwrite_parquet

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(f"k{i}", i, float(i * 2), f"s{i % 3}") for i in range(n)],
        ["oid__id", "amt", "score", "cat"],
    )
    keyed_overwrite_parquet(
        spark, df, t, num_buckets=4, stats_cols=["amt"], vacuum=False
    )
    return t


def test_rename_is_metadata_only(spark, tmp_path):
    from airflow_postgres_etl_spark.sink import (
        _load_manifest,
        rename_column,
    )
    from airflow_postgres_etl_spark.storage import LOCAL_STORE

    t = _cm_table(spark, tmp_path)
    before = _load_manifest(t, LOCAL_STORE)
    v = rename_column(spark, t, "amt", "amount")
    after = _load_manifest(t, LOCAL_STORE)
    assert v == before["version"] + 1
    # zero data moves: the exact same file multiset
    assert after["buckets"] == before["buckets"]
    cols = read_keyed_table(spark, t).columns
    assert "amount" in cols and "amt" not in cols
    # the key and internal names are fenced
    with pytest.raises(ValueError, match="key column"):
        rename_column(spark, t, "oid__id", "id")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(spark, t, "score", "amount")
    with pytest.raises(ValueError, match="no column"):
        rename_column(spark, t, "amt", "x")  # old name is gone


def test_rename_onto_dropped_name_rejected_at_commit(spark, tmp_path):
    """ADVICE r8 (medium): renaming a column to a previously DROPPED
    name used to commit fine, then wedge every later write behind
    _translate_batch's resurrection guard with a misleading error.  The
    guard now fires at rename time, and the table stays writable."""
    from airflow_postgres_etl_spark.sink import (
        drop_column,
        rename_column,
    )

    t = _cm_table(spark, tmp_path)
    drop_column(spark, t, "cat")
    v = table_version(t)
    with pytest.raises(ValueError, match="dropped physical column"):
        rename_column(spark, t, "amt", "cat")
    assert table_version(t) == v  # nothing committed
    # the table is NOT wedged: a normal write still goes through
    batch = spark.createDataFrame(
        [("k0", 999, 0.0)], ["oid__id", "amt", "score"]
    )
    keyed_overwrite_parquet(spark, batch, t)
    got = read_keyed_table(spark, t).filter(F.col("oid__id") == "k0")
    assert got.collect()[0]["amt"] == 999


def test_renamed_column_still_prunes_and_blooms(spark, tmp_path):
    from airflow_postgres_etl_spark.bloom import add_bloom_index
    from airflow_postgres_etl_spark.sink import rename_column

    t = _cm_table(spark, tmp_path)
    rename_column(spark, t, "amt", "amount")
    total = len(read_keyed_table(spark, t).inputFiles())
    pruned = read_keyed_table(spark, t, where=("amount", 35, None))
    assert {r.amount for r in pruned.collect()} == {35, 36, 37, 38, 39}
    assert 0 < len(pruned.inputFiles()) < total  # stats skipped files
    add_bloom_index(spark, t, "amount")
    got = read_keyed_table(spark, t, where_eq=("amount", 7)).collect()
    assert len(got) == 1 and got[0].oid__id == "k7"


def test_all_write_surfaces_speak_logical_after_rename(spark, tmp_path):
    from airflow_postgres_etl_spark.sink import (
        compact_keyed_table,
        keyed_append,
        keyed_delete_where,
        keyed_update_where,
        rename_column,
    )

    t = _cm_table(spark, tmp_path)
    rename_column(spark, t, "amt", "amount")
    cols = ["oid__id", "amount", "score", "cat"]
    keyed_overwrite_parquet(  # CoW
        spark, spark.createDataFrame([("k1", 100, 1.0, "s0")], cols), t,
        vacuum=False,
    )
    keyed_merge_mor(  # MOR
        spark, spark.createDataFrame([("k2", 200, 2.0, "s1")], cols), t
    )
    keyed_append(  # blind append
        spark, spark.createDataFrame([("kx", 999, 9.0, "s2")], cols), t
    )
    compact_keyed_table(spark, t)
    assert keyed_delete_where(spark, t, "amount = 999") == 1
    assert keyed_update_where(
        spark, t, {"score": "amount * 1.0"}, "amount = 200"
    ) == 1
    compact_keyed_table(spark, t)
    got = {r.oid__id: (r.amount, r.score) for r in read_keyed_table(spark, t).collect()}
    assert got["k1"] == (100, 1.0)
    assert got["k2"] == (200, 200.0)
    assert "kx" not in got
    assert len(got) == 40


def test_time_travel_and_restore_are_name_version_exact(spark, tmp_path):
    from airflow_postgres_etl_spark.sink import (
        rename_column,
        restore_keyed_table,
    )

    t = _cm_table(spark, tmp_path)
    rename_column(spark, t, "amt", "amount")
    old = read_keyed_table(spark, t, version=1)
    assert "amt" in old.columns and "amount" not in old.columns
    # restore to the pre-rename snapshot restores the OLD names
    restore_keyed_table(spark, t, 1)
    cur = read_keyed_table(spark, t)
    assert "amt" in cur.columns and "amount" not in cur.columns


def test_freed_name_reuse_round_trips(spark, tmp_path):
    """rename amt->amount then cat->amt: logical 'amt' now labels
    physical 'cat' — the one-shot select translation must not collide."""
    from airflow_postgres_etl_spark.sink import rename_column

    t = _cm_table(spark, tmp_path, n=10)
    rename_column(spark, t, "amt", "amount")
    rename_column(spark, t, "cat", "amt")
    got = {r.oid__id: (r.amount, r.amt) for r in read_keyed_table(spark, t).collect()}
    assert got["k3"] == (3, "s0")
    # and writes translate the swapped names back correctly
    keyed_overwrite_parquet(
        spark,
        spark.createDataFrame(
            [("k3", 33, 6.0, "zz")], ["oid__id", "amount", "score", "amt"]
        ),
        t,
        vacuum=False,
    )
    got = {r.oid__id: (r.amount, r.amt) for r in read_keyed_table(spark, t).collect()}
    assert got["k3"] == (33, "zz")


def test_drop_hides_blocks_resurrection_and_purge_physicalizes(spark, tmp_path):
    import os

    import pyarrow.parquet as pq

    from airflow_postgres_etl_spark.sink import (
        _load_manifest,
        drop_column,
        purge_column_mapping,
        rename_column,
    )
    from airflow_postgres_etl_spark.storage import LOCAL_STORE

    t = _cm_table(spark, tmp_path)
    rename_column(spark, t, "amt", "amount")
    drop_column(spark, t, "cat")
    cols = read_keyed_table(spark, t).columns
    assert "cat" not in cols
    with pytest.raises(ValueError, match="key column"):
        drop_column(spark, t, "oid__id")
    with pytest.raises(ValueError, match="dropped from this table"):
        keyed_overwrite_parquet(
            spark,
            spark.createDataFrame(
                [("k9", 1, 1.0, "zz")], ["oid__id", "amount", "score", "cat"]
            ),
            t,
            vacuum=False,
        )
    expect = {
        (r.oid__id, r.amount, r.score)
        for r in read_keyed_table(spark, t).collect()
    }
    purge_column_mapping(spark, t)
    m = _load_manifest(t, LOCAL_STORE)
    assert m["column_mapping"] == {} and m["dropped_columns"] == []
    got = {
        (r.oid__id, r.amount, r.score)
        for r in read_keyed_table(spark, t).collect()
    }
    assert got == expect
    # physical files now carry logical names; dropped bytes are GONE
    rel = next(f for fs in m["buckets"].values() for f in fs)
    names = pq.ParquetFile(os.path.join(t, rel)).schema_arrow.names
    assert "amount" in names and "amt" not in names and "cat" not in names


def test_gates_fail_closed_until_purge(spark, tmp_path):
    from airflow_postgres_etl_spark.sink import (
        add_table_constraint,
        apply_changes,
        drop_column,
        merge_into,
        purge_column_mapping,
        rename_column,
        table_changes,
        wap_begin,
    )

    t = _cm_table(spark, tmp_path, n=10)
    # constraint referencing a column blocks ITS drop, not others
    add_table_constraint(spark, t, "pos", "amt >= 0")
    with pytest.raises(ValueError, match="constraint"):
        drop_column(spark, t, "amt")
    drop_column(spark, t, "cat")
    src = spark.createDataFrame([("k1", 5)], ["oid__id", "amt"])
    with pytest.raises(ValueError, match="merge_into is not supported"):
        merge_into(spark, t, src, when_matched_update={"amt": "5"})
    with pytest.raises(ValueError, match="apply_changes is not supported"):
        apply_changes(
            spark,
            t,
            spark.createDataFrame(
                [("k1", 1, "upsert", 1, 1.0)],
                ["oid__id", "seq", "op", "amt", "score"],
            ),
            seq_col="seq", op_col="op",
        )
    with pytest.raises(ValueError, match="add_table_constraint is not"):
        add_table_constraint(spark, t, "pos2", "amt >= -1")
    with pytest.raises(ValueError, match="wap_begin is not supported"):
        wap_begin(t, "audit")
    # CDF across the mapping change is gated; within a span it works
    with pytest.raises(ValueError, match="column mapping changed"):
        table_changes(spark, t, 1)
    purge_column_mapping(spark, t)
    add_table_constraint(spark, t, "pos2", "amt >= -1")  # re-enabled


def test_clone_carries_mapping(spark, tmp_path):
    from airflow_postgres_etl_spark.sink import (
        clone_keyed_table,
        drop_column,
        rename_column,
    )

    t = _cm_table(spark, tmp_path, n=10)
    rename_column(spark, t, "amt", "amount")
    drop_column(spark, t, "cat")
    c = str(tmp_path / "c")
    clone_keyed_table(t, c)
    cols = read_keyed_table(spark, c).columns
    assert "amount" in cols and "amt" not in cols and "cat" not in cols


def test_table_facade_rename_drop_purge(spark, tmp_path):
    from airflow_postgres_etl_spark.api import Engine

    t = _cm_table(spark, tmp_path, n=10)
    table = Engine(spark).table(t)
    table.rename_column("amt", "amount")
    table.drop_column("cat")
    cols = table.read().columns
    assert "amount" in cols and "cat" not in cols
    from airflow_postgres_etl_spark.sink import describe_keyed_table

    d = describe_keyed_table(t)
    assert d["column_mapping"] == {"amount": "amt"}
    assert d["dropped_columns"] == ["cat"]
    table.purge_column_mapping()
    assert "amount" in table.read().columns
    d = describe_keyed_table(t)
    assert d["column_mapping"] == {} and d["dropped_columns"] == []


def test_stale_prerename_writer_rejected(spark, tmp_path):
    """A batch still using the PRE-rename column name must be rejected:
    the physical column exists in the files, so without this guard the
    alignment check passes and the stale writer's data silently lands
    under the renamed column."""
    from airflow_postgres_etl_spark.sink import rename_column

    t = _cm_table(spark, tmp_path, n=10)
    rename_column(spark, t, "amt", "amount")
    with pytest.raises(ValueError, match="pre-rename"):
        keyed_overwrite_parquet(
            spark,
            spark.createDataFrame(
                [("k1", 5, 1.0, "s0")], ["oid__id", "amt", "score", "cat"]
            ),
            t,
            vacuum=False,
        )
    # freed-name reuse: 'amt' becomes a legitimate logical again
    rename_column(spark, t, "cat", "amt")
    keyed_overwrite_parquet(
        spark,
        spark.createDataFrame(
            [("k1", 5, 1.0, "zz")], ["oid__id", "amount", "score", "amt"]
        ),
        t,
        vacuum=False,
    )
    got = read_keyed_table(spark, t).filter("oid__id='k1'").collect()[0]
    assert got.amount == 5 and got.amt == "zz"


def test_drop_column_policy_guard_survives_rebase(spark, tmp_path, monkeypatch):
    """r9 review finding: guards evaluated only against the caller's
    stale manifest are bypassed by the optimistic rebase.  A
    set_drift_policy landing between drop_column's manifest load and
    its CAS must fail the drop on the rebase path, not be dropped-under."""
    from airflow_postgres_etl_spark import sink
    from airflow_postgres_etl_spark.operators.expectations import (
        expect_distribution,
    )

    t = _cm_table(spark, tmp_path)
    real_load = sink._load_manifest
    stale = real_load(t, sink.LOCAL_STORE)  # pre-policy snapshot
    sink.set_drift_policy(
        spark, t,
        [expect_distribution("c", "cat", {"s0": 0.4, "s1": 0.3, "s2": 0.3})],
        {"c": 100_000},
    )
    v = sink.table_version(t)

    calls = {"n": 0}

    def stale_once(target, store=sink.LOCAL_STORE):
        calls["n"] += 1
        if calls["n"] == 1:
            return stale
        return real_load(target, store)

    monkeypatch.setattr(sink, "_load_manifest", stale_once)
    with pytest.raises(ValueError, match="drift-policy rule"):
        sink.drop_column(spark, t, "cat")
    monkeypatch.setattr(sink, "_load_manifest", real_load)
    assert sink.table_version(t) == v  # nothing committed
    assert sink.drift_policy(t) is not None  # policy intact


def test_set_drift_policy_revalidates_on_rebase(spark, tmp_path, monkeypatch):
    """The mirror race: a rename of the referenced column landing
    between set_drift_policy's load and its CAS must fail the policy
    commit on the rebase path (else every later maintain wedges)."""
    from airflow_postgres_etl_spark import sink
    from airflow_postgres_etl_spark.operators.expectations import (
        expect_distribution,
    )

    t = _cm_table(spark, tmp_path)
    real_load = sink._load_manifest
    stale = real_load(t, sink.LOCAL_STORE)
    sink.rename_column(spark, t, "cat", "category")
    v = sink.table_version(t)

    calls = {"n": 0}

    def stale_once(target, store=sink.LOCAL_STORE):
        calls["n"] += 1
        if calls["n"] == 1:
            return stale
        return real_load(target, store)

    monkeypatch.setattr(sink, "_load_manifest", stale_once)
    with pytest.raises(ValueError, match="missing columns"):
        sink.set_drift_policy(
            spark, t,
            [expect_distribution("c", "cat", {"s0": 1.0})],
        )
    monkeypatch.setattr(sink, "_load_manifest", real_load)
    assert sink.table_version(t) == v
    assert sink.drift_policy(t) is None
