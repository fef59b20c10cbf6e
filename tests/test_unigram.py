"""Unigram-LM tokenizer (`operators.unigram`): the unrolled Viterbi must
pick the min-cost segmentation with the documented tie-break (longest
piece on equal cost), fall back to single characters, and honor the
L_MAX training contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators.unigram import (
    L_MAX,
    substring_vocab,
    unigram_piece_usage,
    viterbi_segment,
    word_table,
)


def _segment(spark, word, vocab_rows):
    words = spark.createDataFrame([(word, 1)], "word string, freq long")
    vocab = spark.createDataFrame(vocab_rows, "piece string, cnt long, cost long")
    return list(viterbi_segment(words, vocab).first()["pieces"])


def test_min_cost_segmentation(spark):
    # "abc": a|bc (5+4=9) beats ab|c (6+7=13) and a|b|c (5+8+7=20)
    vocab = [("a", 0, 5), ("b", 0, 8), ("c", 0, 7), ("ab", 0, 6), ("bc", 0, 4)]
    assert _segment(spark, "abc", vocab) == ["a", "bc"]


def test_tie_breaks_prefer_longer_piece(spark):
    # ab|c and a|b|c both cost 10 -> the longer first piece wins
    vocab = [("a", 0, 3), ("b", 0, 3), ("c", 0, 4), ("ab", 0, 6)]
    assert _segment(spark, "abc", vocab) == ["ab", "c"]


def test_single_char_fallback(spark):
    # no multi-char pieces at all -> per-character segmentation
    vocab = [("x", 0, 1), ("y", 0, 1), ("z", 0, 1)]
    assert _segment(spark, "zyx", vocab) == ["z", "y", "x"]


def test_corpus_chain_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "stream streams streaming"), (2, "stream table tables")],
        "doc_id long, text string",
    )
    a = {(r["piece"], r["used_cnt"]) for r in unigram_piece_usage(docs).collect()}
    b = {
        (r["piece"], r["used_cnt"])
        for r in unigram_piece_usage(docs.repartition(5)).collect()
    }
    assert a == b and len(a) > 0
    # usage counts conserve corpus word mass: every word occurrence is
    # segmented into >= 1 piece
    total_words = 6
    assert sum(c for _, c in a) >= total_words


def test_long_words_excluded_by_contract(spark):
    docs = spark.createDataFrame(
        [(1, "short " + "x" * (L_MAX + 1))], "doc_id long, text string"
    )
    words = word_table(docs)
    assert {r["word"] for r in words.collect()} == {"short"}
    vocab = substring_vocab(words)
    # vocab only ever sees pieces of the admitted words
    assert all(len(r["piece"]) <= 4 for r in vocab.collect())


def test_em_round_prunes_and_conserves(spark):
    from airflow_postgres_etl_spark.operators.unigram import (
        unigram_piece_usage,
        unigram_piece_usage_em,
    )

    docs = spark.createDataFrame(
        [(1, "streaming streams stream streamer"),
         (2, "stream table stream tables streaming")],
        "doc_id long, text string",
    )
    u0 = {r["piece"]: r["used_cnt"] for r in unigram_piece_usage(docs).collect()}
    u1 = {r["piece"]: r["used_cnt"] for r in unigram_piece_usage_em(docs).collect()}
    # every word still fully segmented: summed piece characters conserve
    # corpus characters in BOTH rounds (pieces tile the words exactly)
    chars0 = sum(len(p) * c for p, c in u0.items())
    chars1 = sum(len(p) * c for p, c in u1.items())
    assert chars0 == chars1 > 0
    # hard-EM concentrates mass: the vocabulary in play never grows
    assert len(u1) <= len(u0)
    # deterministic under repartition
    u1b = {
        r["piece"]: r["used_cnt"]
        for r in unigram_piece_usage_em(docs.repartition(4)).collect()
    }
    assert u1 == u1b


def test_em_curve_monotone_and_fixed_point(spark):
    """VERDICT r7 task 6: hard-EM iterated — the corpus cost (exact
    integer micro-nats) is NON-INCREASING round over round, improves at
    least once from the init vocab, and is exactly stationary once
    segmentations stop changing."""
    from airflow_postgres_etl_spark.operators.unigram import unigram_em_curve

    docs = spark.createDataFrame(
        [(1, "streaming streams stream streamer tables"),
         (2, "stream table stream tables streaming stream"),
         (3, "streamer tablet table stream tables")],
        "doc_id long, text string",
    )
    rows = unigram_em_curve(docs, rounds=4).orderBy("round").collect()
    costs = [r["corpus_cost_micro"] for r in rows]
    assert len(costs) == 5
    assert all(a >= b for a, b in zip(costs, costs[1:])), costs  # monotone
    assert costs[-1] < costs[0]  # at least one real improvement
    # fixed point: once two consecutive rounds are equal, the rest are
    settled = [i for i in range(1, 5) if costs[i] == costs[i - 1]]
    if settled:
        first = settled[0]
        assert all(c == costs[first] for c in costs[first:])
    # the vocab only ever shrinks (unigram prune) and never loses chars
    sizes = [r["vocab_size"] for r in rows]
    assert all(a >= b for a, b in zip(sizes, sizes[1:])), sizes
