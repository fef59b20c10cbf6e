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
    index = spark.read.parquet(idx)
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
