"""BPE encode semantics: the learned-merge application must PARTITION
each word (char conservation), and match a direct reference rendition of
the documented procedure (per merge, two non-overlapping left-to-right
replace passes over the padded symbol string)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.plans.extensions import (
    _BPE_MERGES,
    _bpe_symbol_chain,
)
from airflow_postgres_etl_spark.sources.parquet_source import load_table

from .conftest import SF_SMOKE


def test_bpe_tokens_partition_each_word(spark):
    """Concatenating a word's subword tokens reproduces the word —
    merges can regroup characters, never create or drop them."""
    docs = load_table(spark, SF_SMOKE, "documents")
    _m, syms = _bpe_symbol_chain(docs, _BPE_MERGES)
    bad = (
        syms.withColumn("rejoined", F.replace(F.trim("sym"), F.lit(" "), F.lit("")))
        .filter(F.col("rejoined") != F.col("word"))
        .limit(1)
        .collect()
    )
    assert not bad, f"merge application corrupted a word: {bad}"


def test_bpe_encode_matches_python_reference(spark):
    """Replay the documented merge procedure in plain Python over the
    learned rules and diff the full per-word tokenization."""
    docs = load_table(spark, SF_SMOKE, "documents")
    merges, syms = _bpe_symbol_chain(docs, _BPE_MERGES)
    rules = [
        m.collect()[0].pair for m in merges
    ]  # ordered: iteration 0 first
    got = {r.word: r.sym for r in syms.collect()}

    def encode(word: str) -> str:
        sym = " " + " ".join(word) + " "
        for pair in rules:
            pat = f" {pair} "
            rep = " " + pair.replace(" ", "") + " "
            sym = sym.replace(pat, rep).replace(pat, rep)
        return sym

    assert got
    mism = {w for w, s in got.items() if s != encode(w)}
    assert not mism, f"{len(mism)} words diverge, e.g. {sorted(mism)[:3]}"


def test_bpe_merges_reduce_token_count(spark):
    """Each word's subword count is between 1 and its length, and the
    corpus-weighted total strictly decreases vs the char-split start
    (the merges actually fired)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    _m, syms = _bpe_symbol_chain(docs, _BPE_MERGES)
    row = syms.select(
        F.size(F.filter(F.split("sym", " "), lambda x: x != "")).alias("n"),
        F.length("word").alias("wl"),
        "weight",
    ).agg(
        F.min(F.col("wl") - F.col("n")).alias("min_gain"),
        F.max(F.col("n") - F.col("wl")).alias("overrun"),
        F.sum(F.col("n") * F.col("weight")).alias("total"),
        F.sum(F.col("wl") * F.col("weight")).alias("chars"),
    ).collect()[0]
    assert row.overrun <= 0  # never more tokens than characters
    assert row.total < row.chars  # merges strictly compressed the corpus
