"""Incremental dedup against a persisted MinHash index: new batches dedup
against the historical corpus without recomputing it."""

from __future__ import annotations

from airflow_postgres_etl_spark.operators.dedup import (
    build_minhash_index,
    dedup_against_index,
    lsh_verified_pairs,
)


def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog by the river bank today"
    rows = [(i, base + f" extra token{i}") for i in range(10)]
    rows += [(100 + i, f"totally different document number {i} about spark engines and parquet files galore") for i in range(5)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_against_index_filters_near_dups(spark, tmp_path):
    idx = str(tmp_path / "minhash_index")
    hist = corpus(spark)
    build_minhash_index(hist, idx)

    batch = spark.createDataFrame(
        [
            # near-dup of the historical base docs -> must be dropped
            (500, "the quick brown fox jumps over the lazy dog by the river bank today extra token1"),
            # genuinely new -> must survive
            (501, "completely unrelated text describing a postgres airflow pipeline with celery workers"),
        ],
        ["doc_id", "text"],
    )
    out = dedup_against_index(batch, idx)
    got = {r.doc_id for r in out.collect()}
    assert got == {501}

    # consistency: the dropped doc IS lsh-verified similar to the corpus
    both = hist.unionByName(batch)
    pairs = lsh_verified_pairs(both)
    flagged = {
        r.doc_b for r in pairs.collect() if r.doc_b >= 500
    } | {r.doc_a for r in pairs.collect() if r.doc_a >= 500}
    assert 500 in flagged and 501 not in flagged


def test_dedup_against_index_idempotent_for_clean_batch(spark, tmp_path):
    idx = str(tmp_path / "minhash_index")
    hist = corpus(spark)
    build_minhash_index(hist, idx)
    batch = spark.createDataFrame(
        [(600, "some fresh unseen sentence with enough tokens to form shingles here")],
        ["doc_id", "text"],
    )
    assert dedup_against_index(batch, idx).count() == 1


def test_index_build_cap_drops_hot_bands(spark, tmp_path):
    """max_band_size at index BUILD time: a boilerplate group's oversized
    bands never enter the index, so incremental batches matching that
    boilerplate generate no candidates against it — while normal docs
    still dedup exactly."""
    from pyspark.sql import functions as F

    boiler = "subscribe to the newsletter all rights reserved terms apply here"
    hist = spark.createDataFrame(
        [(i, boiler) for i in range(10)]
        + [(50, "a unique historical document about spark shuffle tuning details")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "capped_index")
    build_minhash_index(hist, idx, max_band_size=5)

    # the boilerplate bands (occupancy 10) are absent from the index
    from airflow_postgres_etl_spark.operators.dedup import read_minhash_index

    index = read_minhash_index(spark, idx)
    max_band = (
        index.groupBy("band_idx", "band_key").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_band <= 5

    batch = spark.createDataFrame(
        [
            (600, boiler),  # matches only capped-away bands -> SURVIVES (by design)
            (601, "a unique historical document about spark shuffle tuning details"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id for r in dedup_against_index(batch, idx).collect()}
    # 601 deduped against the (uncapped) unique doc; 600 passes because its
    # only matches were dropped as boilerplate-skew bands — the documented
    # recall trade of the cap
    assert got == {600}


def test_compact_minhash_index_swaps_and_retires(spark, tmp_path):
    """Compaction rebuilds the band table from the accepted corpus behind
    the manifest swap: dedup decisions are unchanged for normal docs, a
    band grown hot by appends is re-capped globally, the superseded data
    directory is retired (still on disk) and reclaimed only by vacuum."""
    import os

    from airflow_postgres_etl_spark.operators.dedup import (
        append_to_minhash_index,
        compact_minhash_index,
        minhash_index_exists,
        read_minhash_index,
        vacuum_minhash_index,
    )
    from airflow_postgres_etl_spark.storage import LOCAL_STORE

    idx = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    boiler = "subscribe to the newsletter all rights reserved terms apply here"
    unique = "a unique historical document about spark shuffle tuning details"

    assert not minhash_index_exists(idx)
    # batch 1: 4 boilerplate + 1 unique doc; batch 2 appends 4 more
    # boilerplate — each batch is under the cap (so the per-batch cap
    # keeps them), the UNION is not: the append-regrowth hazard
    # compaction exists to fix
    b1 = spark.createDataFrame(
        [(i, boiler) for i in range(4)] + [(50, unique)], ["doc_id", "text"]
    )
    b2 = spark.createDataFrame(
        [(10 + i, boiler) for i in range(4)], ["doc_id", "text"]
    )
    build_minhash_index(b1, idx, max_band_size=5)
    assert minhash_index_exists(idx)
    append_to_minhash_index(b2, idx, max_band_size=5)
    b1.unionByName(b2).write.mode("overwrite").parquet(corpus_path)

    # pre-compaction: the boilerplate band has regrown to occupancy 8
    from pyspark.sql import functions as F  # noqa: F811

    occ = (
        read_minhash_index(spark, idx)
        .groupBy("band_idx", "band_key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert occ == 8

    probe = spark.createDataFrame(
        [(600, boiler), (601, unique), (602, "fresh novel text about manifest swaps here")],
        ["doc_id", "text"],
    )
    before = {r.doc_id for r in dedup_against_index(probe, idx).collect()}

    old_manifest = LOCAL_STORE.read_json(os.path.join(idx, "_index_manifest.json"))
    old_dir = os.path.join(idx, old_manifest["data_dir"])
    compact_minhash_index(spark, idx, corpus_path, max_band_size=5)

    # the hot band is re-capped globally; decisions for normal docs are
    # unchanged (601 dedups against the unique doc, 602 survives as
    # genuinely new, before and after), while 600 — whose only matches
    # were the regrown boilerplate band — flips to accepted: the
    # documented recall trade of the cap, now re-applied globally
    occ2 = (
        read_minhash_index(spark, idx)
        .groupBy("band_idx", "band_key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert occ2 <= 5
    after = {r.doc_id for r in dedup_against_index(probe, idx).collect()}
    assert before == {602}
    assert after == {600, 602}

    # superseded dir is retired, not deleted: readers on the old snapshot
    # can finish; version bumped; vacuum under retention keeps it, past
    # retention reclaims it
    new_manifest = LOCAL_STORE.read_json(os.path.join(idx, "_index_manifest.json"))
    assert new_manifest["version"] == old_manifest["version"] + 1
    assert [e["dir"] for e in new_manifest["retired"]] == [old_manifest["data_dir"]]
    assert os.path.isdir(old_dir)
    assert vacuum_minhash_index(idx) == 0  # default 1 h retention: kept
    assert os.path.isdir(old_dir)
    assert vacuum_minhash_index(idx, retention_s=0) == 1
    assert not os.path.isdir(old_dir)
    # manifest pruned; the live index still reads
    m3 = LOCAL_STORE.read_json(os.path.join(idx, "_index_manifest.json"))
    assert m3["retired"] == []
    assert read_minhash_index(spark, idx).count() > 0


def test_compact_detects_concurrent_compactor(spark, tmp_path):
    """Two compactors racing: the loser's conditional manifest PUT fails
    with ConcurrentWriteError instead of clobbering the winner."""
    import pytest

    from airflow_postgres_etl_spark.operators import dedup as D
    from airflow_postgres_etl_spark.storage import (
        ConcurrentWriteError,
        LocalManifestStore,
    )

    idx = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    docs = spark.createDataFrame(
        [(1, "one unique document about adaptive query execution in spark")],
        ["doc_id", "text"],
    )
    build_minhash_index(docs, idx)
    docs.write.mode("overwrite").parquet(corpus_path)

    class RacingStore(LocalManifestStore):
        def __init__(self):
            self.fired = False

        def replace_if_version(self, path, manifest, expected_version):
            if not self.fired and expected_version is not None:
                self.fired = True
                # a competing compactor lands first
                current = self.read_json(path)
                current["version"] += 1
                super().replace_if_version(path, current, None)
            super().replace_if_version(path, manifest, expected_version)

    with pytest.raises(ConcurrentWriteError):
        D.compact_minhash_index(spark, idx, corpus_path, store=RacingStore())
