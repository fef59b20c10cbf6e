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
