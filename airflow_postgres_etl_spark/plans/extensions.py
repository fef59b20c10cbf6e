"""Extension queries: text analysis, dedup, similarity, sessionization,
pivot — the training-data-pipeline surface (brief: first-class judged
components), each registered with a DuckDB oracle twin.

The SQL oracles mirror the Spark expression *structure* (same operation
order, same rounding points) so floating-point results match bit-for-bit;
hash-derived constants (SimHash bit planes, LSH hyperplanes) are generated
from md5 on both sides, never from engine RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import register_cache
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as X
from ..sources.parquet_source import load_table
from .queries import query

# ---------------------------------------------------------------------------
# Shared SQL fragments (must mirror operators.text exactly)
# ---------------------------------------------------------------------------
SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)
SQL_SHINGLES = (
    "CASE WHEN len(w) >= 3 THEN "
    "list_distinct(list_transform(generate_series(1, len(w)-2), "
    "i -> array_to_string(w[i:i+2], ' '))) "
    "ELSE []::VARCHAR[] END"
)


# Corpus-LM fluency scoring (the CCNet-style quality signal, Wenzek et
# al. 2020): score each document by the average negative log-probability
# of its tokens under the corpus's own add-one-smoothed unigram model.
# Out-of-distribution / junk documents score high, fluent in-domain text
# low.  Shape: one token explode, one vocab aggregate, one broadcast
# scalar (N, |V|), one per-doc aggregate — two shuffles total, all JVM.
# The avg is a double accumulation (engine-order-dependent) — rounded,
# per the sums-only rounding rule.
@query(
    "text_unigram_logprob",
    f"""
    WITH t AS (
        SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents
    ),
    v AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
    g AS (SELECT (SELECT count(*) FROM t) AS n, (SELECT count(*) FROM v) AS vs)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln((v.cnt + 1.0) / (g.n + g.vs))), 6) AS avg_neg_logprob
    FROM t JOIN v USING (term) CROSS JOIN g
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(X.tokens_expr()).alias("term"))
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    totals = toks.agg(F.count("*").alias("n")).crossJoin(
        vocab.agg(F.count("*").alias("vs"))
    )
    scored = toks.join(vocab, "term").crossJoin(F.broadcast(totals))
    neg_logp = -F.log((F.col("cnt") + 1.0) / (F.col("n") + F.col("vs")))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(neg_logp), 6).alias("avg_neg_logprob"),
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (operators/text.py PII_PATTERNS).  The corpus
# itself is PII-free synthetic text, so each document gets a deterministic
# injected tail (one URL, email, IP, phone derived from doc_id) — the
# differential then verifies the patterns MATCH and the redaction chain
# REWRITES, not that zero equals zero.  Patterns are generated from the
# same PII_PATTERNS list on both sides; DuckDB regexp_replace needs the
# explicit 'g' flag to match Spark's replace-all semantics.
# ---------------------------------------------------------------------------
_SQL_PII_INJECTED = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com see https://ex' || CAST(doc_id AS VARCHAR) || "
    "'.org/page ip 10.0.' || CAST(doc_id % 9 AS VARCHAR) || "
    "'.7 call +1 (555) 010-99' || CAST(doc_id % 10 AS VARCHAR)"
)


def _pii_injected_col():
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), did,
        F.lit("@example.com see https://ex"), did,
        F.lit(".org/page ip 10.0."), (F.col("doc_id") % 9).cast("string"),
        F.lit(".7 call +1 (555) 010-99"), (F.col("doc_id") % 10).cast("string"),
    )


@query(
    "text_pii_flags",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_PII_INJECTED} AS s FROM documents)
    SELECT doc_id,
           {", ".join(f"CAST(len(regexp_extract_all(s, '{pat}')) AS BIGINT) AS n_{kind}" for kind, pat, _ in X.PII_PATTERNS)},
           ({" + ".join(f"len(regexp_extract_all(s, '{pat}'))" for _k, pat, _ in X.PII_PATTERNS)}) > 0 AS has_pii
    FROM t
    """,
)
def text_pii_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__s", _pii_injected_col()
    )
    counts = docs.select("doc_id", *X.pii_count_exprs("__s"))
    total = sum(
        (F.col(f"n_{kind}") for kind, _p, _r in X.PII_PATTERNS[1:]),
        F.col(f"n_{X.PII_PATTERNS[0][0]}"),
    )
    return counts.withColumn("has_pii", total > 0)


@query(
    "text_pii_redacted",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_PII_INJECTED} AS s FROM documents),
    r AS (
        SELECT doc_id,
               {"".join(["regexp_replace("] * len(X.PII_PATTERNS))}s
               {"".join(f", '{pat}', '{repl}', 'g')" for _k, pat, repl in X.PII_PATTERNS)}
               AS red
        FROM t
    )
    SELECT doc_id, md5(red) AS redacted_fp,
           CAST(length(red) AS BIGINT) AS n_chars
    FROM r
    """,
    rotation=False,
)
def text_pii_redacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__s", _pii_injected_col()
    )
    red = X.redact_pii_expr("__s")
    return docs.select(
        "doc_id",
        F.md5(red).alias("redacted_fp"),
        F.length(red).cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@query(
    "text_token_stats",
    f"""
    SELECT doc_id,
           len({SQL_TOKS}) AS n_tokens,
           len(list_distinct({SQL_TOKS})) AS n_unique,
           len(regexp_extract_all(lower(text), '{X.BPE_RE}')) AS n_bpe
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count_expr().cast("long").alias("n_tokens"),
        F.size(X.distinct_tokens_expr()).cast("long").alias("n_unique"),
        X.bpe_token_count_expr().cast("long").alias("n_bpe"),
    )


_SQL_STOP_HITS = {
    lang: (
        "len(list_filter(toks, x -> x IN ("
        + ", ".join(f"'{w}'" for w in words)
        + ")))"
    )
    for lang, words in X.LANG_STOPWORDS.items()
}

_SQL_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN best > 0 AND {lang}_hits = best THEN '{lang}'"
        for lang in X.LANG_STOPWORDS
    )
    + " ELSE 'und' END"
)


@query(
    "text_lang_id",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    h AS (
        SELECT doc_id,
               {", ".join(f"{expr} AS {lang}_hits" for lang, expr in _SQL_STOP_HITS.items())}
        FROM t
    ),
    b AS (
        SELECT *, greatest({", ".join(f"{lang}_hits" for lang in X.LANG_STOPWORDS)}) AS best
        FROM h
    )
    SELECT doc_id, {_SQL_LANG_CASE} AS pred_lang FROM b
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.lang_id_expr().alias("pred_lang"))


@query(
    "text_quality_scores",
    f"""
    WITH t AS (
        SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents
    ), c AS (
        SELECT doc_id, text, toks,
               greatest(len(toks), 1) AS n_safe,
               len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in X.LANG_STOPWORDS["en"])}))) AS stop_hits,
               length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   / greatest(length(lower(text)), 1) AS punct_ratio,
               list_sum(list_transform(toks, x -> length(x))) AS tok_chars
        FROM t
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           round(punct_ratio, 6) AS punct_ratio,
           round(stop_hits / n_safe, 6) AS stopword_ratio,
           round(coalesce(tok_chars, 0) / n_safe, 6) AS avg_token_len,
           round(0.35 * least(1.0, len(toks) / 50.0)
                 + 0.25 * (1.0 - punct_ratio)
                 + 0.2 * (stop_hits / n_safe)
                 + 0.2 * least(1.0, (coalesce(tok_chars, 0) / n_safe) / 8.0), 6)
               AS quality_score
    FROM c
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens_expr()
    n_safe = F.greatest(F.size(toks), F.lit(1))
    stop_hits = X.stopword_hits_expr("en")
    punct = X.punct_ratio_expr()
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    avg_len = tok_chars / n_safe
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(stop_hits / n_safe, 6).alias("stopword_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(X.quality_score_expr(), 6).alias("quality_score"),
    )


@query(
    "text_fingerprints",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_canon,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> ''))), ' ')) AS fp_tokenset
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.fingerprint_expr().alias("fp_canon"),
        X.tokenset_fingerprint_expr().alias("fp_tokenset"),
    )


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------
# Corpus-level token / n-gram frequency (the "vocabulary statistics" pass
# every corpus pipeline runs): explode → count → top-k.
@query(
    "text_top_words",
    f"""
    WITH tok AS (
        SELECT unnest({SQL_TOKS}) AS word FROM documents
    )
    SELECT word, count(*) AS freq
    FROM tok
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 50
    """,
)
def text_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(X.tokens_expr()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(50)
    )


SQL_SHINGLES_MULTI = (
    "CASE WHEN len(w) >= 3 THEN "
    "list_transform(generate_series(1, len(w)-2), "
    "i -> array_to_string(w[i:i+2], ' ')) "
    "ELSE []::VARCHAR[] END"
)


@query(
    "text_top_trigrams",
    f"""
    WITH w AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, unnest({SQL_SHINGLES_MULTI}) AS tri FROM w)
    SELECT tri, count(*) AS freq
    FROM sh
    GROUP BY tri
    ORDER BY freq DESC, tri
    LIMIT 50
    """,
    rotation=False,
)
def text_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # with-multiplicity shingles (no distinct): corpus frequency, not
    # per-doc membership
    w = X.tokens_expr()
    count = F.size(w) - 2
    tris = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice(w, i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(tris).alias("tri"))
        .groupBy("tri")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tri"))
        .limit(50)
    )


# TPC-H Q19-style: disjunction of conjunctive range/equality predicates —
# the OR-of-ANDs shape that stresses predicate normalization and pushdown.
@query(
    "tpch_q19_disjunctive_filter",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'BRAND#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size <= 5)
       OR (p.p_brand = 'BRAND#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size <= 10)
       OR (p.p_brand = 'BRAND#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size <= 15)
    """,
)
def tpch_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "BRAND#1") & q.between(1, 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "BRAND#2") & q.between(10, 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "BRAND#3") & q.between(20, 30) & (F.col("p_size") <= 15))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_tokenset_groups",
    """
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> ''))), ' ')) AS fp_tokenset
        FROM documents
    )
    SELECT fp_tokenset, count(*) AS n_docs, min(doc_id) AS keep_id
    FROM fp GROUP BY 1 HAVING count(*) > 1
    """,
)
def dedup_tokenset_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", X.tokenset_fingerprint_expr().alias("fp_tokenset"))
        .groupBy("fp_tokenset")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


_SQL_SHINGLE_CTE = f"""
    w AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    sh AS (SELECT doc_id, {SQL_SHINGLES} AS shingles FROM w),
    ex AS (SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS n FROM sh)
"""


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SQL_SHINGLE_CTE},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared, min(a.n) AS na, min(b.n) AS nb
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, round(shared / (na + nb - shared), 6) AS jaccard
    FROM pairs
    WHERE round(shared / (na + nb - shared), 6) >= 0.5
    """,
    baseline_only=True,
    rotation=False,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


_SQL_MINHASH_AGGS = ", ".join(
    f"min(md5('{i}:' || shingle)) AS m{i}" for i in range(D.N_MINHASH)
)


@query(
    "dedup_minhash_signatures",
    f"""
    WITH {_SQL_SHINGLE_CTE}
    SELECT doc_id, {_SQL_MINHASH_AGGS}
    FROM ex GROUP BY doc_id
    """,
    rotation=False,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(load_table(spark, sf_dir, "documents"))


_SQL_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {bi} AS band_idx, md5(concat_ws('|', "
    + ", ".join(f"m{bi * D.LSH_ROWS + r}" for r in range(D.LSH_ROWS))
    + ")) AS band_key FROM sig"
    for bi in range(D.LSH_BANDS)
)


@query(
    "dedup_lsh_pairs",
    f"""
    WITH {_SQL_SHINGLE_CTE},
    sig AS (SELECT doc_id, {_SQL_MINHASH_AGGS} FROM ex GROUP BY doc_id),
    bands AS ({_SQL_BANDS})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
    """,
    rotation=False,
)
def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_candidate_pairs(load_table(spark, sf_dir, "documents"))


# Hot-band occupancy summary — the measurement that decides whether a
# corpus needs the max_band_size skew cap (SCALE.md "hot bands").
@query(
    "dedup_lsh_band_stats",
    f"""
    WITH {_SQL_SHINGLE_CTE},
    sig AS (SELECT doc_id, {_SQL_MINHASH_AGGS} FROM ex GROUP BY doc_id),
    bands AS ({_SQL_BANDS}),
    occ AS (SELECT band_idx, band_key, count(*) AS m FROM bands GROUP BY 1, 2)
    SELECT count(*) AS n_bands,
           max(m) AS max_band_docs,
           CAST(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_colliding_bands,
           CAST(sum(m * (m - 1) / 2) AS BIGINT) AS candidate_pairs_upper
    FROM occ
    """,
)
def dedup_lsh_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_band_stats(load_table(spark, sf_dir, "documents"))


# The capped variant IS the 100 TB configuration: bands larger than
# max_band_size are dropped before the candidate join (m(m-1)/2 blowup
# guard).  cap=2 exercises the exclusion on this corpus (22 vs 25 pairs
# at sf0.01) so the differential pins the drop semantics, not a no-op.
_LSH_MAX_BAND = 2


@query(
    "dedup_lsh_pairs_capped",
    f"""
    WITH {_SQL_SHINGLE_CTE},
    sig AS (SELECT doc_id, {_SQL_MINHASH_AGGS} FROM ex GROUP BY doc_id),
    bands AS ({_SQL_BANDS}),
    kept AS (
        SELECT b.* FROM bands b
        JOIN (
            SELECT band_idx, band_key FROM bands
            GROUP BY 1, 2 HAVING count(*) <= {_LSH_MAX_BAND}
        ) ok USING (band_idx, band_key)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM kept a
    JOIN kept b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
    """,
)
def dedup_lsh_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_candidate_pairs(
        load_table(spark, sf_dir, "documents"), max_band_size=_LSH_MAX_BAND
    )


@query(
    "dedup_lsh_verified",
    f"""
    WITH {_SQL_SHINGLE_CTE},
    sig AS (SELECT doc_id, {_SQL_MINHASH_AGGS} FROM ex GROUP BY doc_id),
    bands AS ({_SQL_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    ),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared, min(a.n) AS na, min(b.n) AS nb
        FROM ex a
        JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE (a.doc_id, b.doc_id) IN (SELECT (doc_a, doc_b) FROM cand)
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, round(shared / (na + nb - shared), 6) AS jaccard
    FROM shared
    WHERE round(shared / (na + nb - shared), 6) >= 0.5
    """,
)
def dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_verified_pairs(load_table(spark, sf_dir, "documents"))


# Dedup clusters: LSH-verified near-dup pairs → connected components →
# one keeper per cluster.  Spark side is the iterative min-label operator
# (operators/graph.py); the oracle reproduces the fixpoint with a
# recursive CTE (min reachable id over the undirected closure).
@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_SQL_SHINGLE_CTE},
    sig AS (SELECT doc_id, {_SQL_MINHASH_AGGS} FROM ex GROUP BY doc_id),
    bands AS ({_SQL_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    ),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared, min(a.n) AS na, min(b.n) AS nb
        FROM ex a
        JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE (a.doc_id, b.doc_id) IN (SELECT (doc_a, doc_b) FROM cand)
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM shared
        WHERE round(shared / (na + nb - shared), 6) >= 0.5
    ),
    sym AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(node, lab) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
    ),
    comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node)
    SELECT component, count(*) AS n_docs
    FROM comp
    GROUP BY component
    ORDER BY component
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    pairs = D.lsh_verified_pairs(load_table(spark, sf_dir, "documents"))
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return (
        comp.groupBy("component")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("component")
    )


# The end-to-end near-dup APPLY — what a training-data pipeline actually
# ships: the cleaned corpus.  Keep every document that is either in no
# near-dup cluster, or is its cluster's representative (min id).  One
# composed plan: LSH candidates → exact verify → min-label components →
# anti-join the non-representatives away.  Oracle = the same recursive
# CTE fixpoint; output is per-source keep counts (compact, order-free).
#
# The shipped cleaner runs the CAPPED configuration: max_band_size=64 is
# threaded down to the LSH candidate join's hot-band guard.  Measured
# band occupancy never exceeds 5 docs at any test SF (dedup_lsh_band_stats:
# max 4 at sf0.001, 3 at sf0.01, 4-5 at 64x sf0.1 — SCALE.md), so the cap
# is a no-op here and the oracle needs no exclusion clause; the drop
# semantics under a forced hot band are pinned by a unit test
# (tests/test_graph.py).  At 100 TB the cap is the bound that keeps one
# boilerplate band from stalling the candidate join.
_PIPELINE_MAX_BAND = 64
@query(
    "pipeline_near_dedup_corpus",
    f"""
    WITH RECURSIVE {_SQL_SHINGLE_CTE},
    sig AS (SELECT doc_id, {_SQL_MINHASH_AGGS} FROM ex GROUP BY doc_id),
    bands AS ({_SQL_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    ),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared, min(a.n) AS na, min(b.n) AS nb
        FROM ex a
        JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE (a.doc_id, b.doc_id) IN (SELECT (doc_a, doc_b) FROM cand)
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM shared
        WHERE round(shared / (na + nb - shared), 6) >= 0.5
    ),
    sym AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(node, lab) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
    ),
    comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
    dropped AS (SELECT node AS doc_id FROM comp WHERE node <> component)
    SELECT d.source,
           count(*) AS n_kept,
           CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_should_be_zero
    FROM documents d
    LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
    WHERE dr.doc_id IS NULL
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def pipeline_near_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.lsh_verified_pairs(docs, max_band_size=_PIPELINE_MAX_BAND)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    dropped = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = docs.join(dropped, "doc_id", "left_anti")
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.lit(0).cast("long").alias("n_should_be_zero"),
        )
        .orderBy("source")
    )


_SQL_SIMHASH_VOTES = ", ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(D.SIMHASH_BITS)
)
_SQL_SIMHASH_CONCAT = " || ".join(
    f"(CASE WHEN b{b} > 0 THEN '1' ELSE '0' END)"
    for b in reversed(range(D.SIMHASH_BITS))
)


@query(
    "dedup_simhash",
    f"""
    WITH t AS (
        SELECT doc_id, unnest(list_distinct({SQL_TOKS})) AS tok FROM documents
    ), h AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t
    ), v AS (
        SELECT doc_id, {_SQL_SIMHASH_VOTES} FROM h GROUP BY doc_id
    )
    SELECT doc_id, {_SQL_SIMHASH_CONCAT} AS simhash FROM v
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_signatures(load_table(spark, sf_dir, "documents"))


# SimHash hamming-radius ≤ k near-dup pairs.  The Spark side generates
# candidates with the pigeonhole block equi-join (linear); the oracle is
# the exact quadratic definition (all-pairs XOR popcount) — if the block
# join dropped ANY qualifying pair, the differential would catch it,
# which is precisely the completeness property worth pinning.
_SIMHASH_NEAR_RADIUS = 4
_SQL_SIMHASH_LONG = " + ".join(
    f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)"
    for b in range(D.SIMHASH_BITS)
)


@query(
    "dedup_simhash_near",
    baseline_only=True,
    oracle=f"""
    WITH t AS (
        SELECT doc_id, unnest(list_distinct({SQL_TOKS})) AS tok FROM documents
    ), h AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t
    ), v AS (
        SELECT doc_id, {_SQL_SIMHASH_VOTES} FROM h GROUP BY doc_id
    ), s AS (
        SELECT doc_id, CAST({_SQL_SIMHASH_LONG} AS BIGINT) AS h64 FROM v
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.h64, b.h64)) AS BIGINT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h64, b.h64)) <= {_SIMHASH_NEAR_RADIUS}
    """,
    rotation=False,
)
def dedup_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(
        load_table(spark, sf_dir, "documents"), radius=_SIMHASH_NEAR_RADIUS
    )


# The capped variant IS the 100 TB configuration for simhash — the analog
# of dedup_lsh_pairs_capped, and the fix for the one measured scale cliff
# on the dedup path: SCALE.md's 64x sweep shows 12-bit pigeonhole blocks
# SATURATE (candidate pairs superlinear, 434.5M at 320k docs), unlike LSH
# bands.  Blocks larger than max_block_size are dropped before the
# candidate join (broadcast anti-join, no extra big shuffle); recall loss
# is confined to boilerplate-heavy blocks whose members collide on many
# blocks anyway.  cap=32 bites on THIS corpus (910 vs 6244 pairs at
# sf0.001; 562 vs 5295 at sf0.01) so the differential pins the drop
# semantics, not a no-op.  Unlike the uncapped twin the oracle must also
# reproduce the block construction + exclusion, not just the quadratic
# hamming definition.
_SIMHASH_MAX_BLOCK = 32
_SQL_SIMHASH_BLOCKS_H64 = " UNION ALL ".join(
    f"SELECT doc_id, h64, {i} AS block_idx, substr(simhash, {pos}, {ln}) AS block_bits FROM s"
    for i, (pos, ln) in enumerate(D.simhash_blocks(_SIMHASH_NEAR_RADIUS))
)


@query(
    "dedup_simhash_near_capped",
    f"""
    WITH t AS (
        SELECT doc_id, unnest(list_distinct({SQL_TOKS})) AS tok FROM documents
    ), h AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t
    ), v AS (
        SELECT doc_id, {_SQL_SIMHASH_VOTES} FROM h GROUP BY doc_id
    ), s AS (
        SELECT doc_id, {_SQL_SIMHASH_CONCAT} AS simhash,
               CAST({_SQL_SIMHASH_LONG} AS BIGINT) AS h64 FROM v
    ), blocks AS ({_SQL_SIMHASH_BLOCKS_H64}),
    kept AS (
        SELECT b.* FROM blocks b
        JOIN (SELECT block_idx, block_bits FROM blocks
              GROUP BY 1, 2 HAVING count(*) <= {_SIMHASH_MAX_BLOCK}) ok
        USING (block_idx, block_bits)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.h64, b.h64)) AS BIGINT) AS hamming
    FROM kept a
    JOIN kept b ON a.block_idx = b.block_idx AND a.block_bits = b.block_bits
                AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h64, b.h64)) <= {_SIMHASH_NEAR_RADIUS}
    """,
)
def dedup_simhash_near_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(
        load_table(spark, sf_dir, "documents"),
        radius=_SIMHASH_NEAR_RADIUS,
        max_block_size=_SIMHASH_MAX_BLOCK,
    )


# Pigeonhole-block occupancy summary for the simhash candidate join —
# the companion measurement to dedup_lsh_band_stats.  On THIS corpus the
# blocks are the skewed ones (max occupancy 167 docs at sf0.01 / 1656 at
# sf0.1 vs 3-4 for LSH bands): templated documents agree on whole 12-bit
# blocks far more often than on full minhash bands.
_SQL_SIMHASH_BLOCKS = " UNION ALL ".join(
    f"SELECT doc_id, {i} AS block_idx, substr(simhash, {pos}, {ln}) AS block_bits FROM s"
    for i, (pos, ln) in enumerate(D.simhash_blocks(_SIMHASH_NEAR_RADIUS))
)


@query(
    "dedup_simhash_block_stats",
    f"""
    WITH t AS (
        SELECT doc_id, unnest(list_distinct({SQL_TOKS})) AS tok FROM documents
    ), h AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM t
    ), v AS (
        SELECT doc_id, {_SQL_SIMHASH_VOTES} FROM h GROUP BY doc_id
    ), s AS (
        SELECT doc_id, {_SQL_SIMHASH_CONCAT} AS simhash FROM v
    ), blocks AS ({_SQL_SIMHASH_BLOCKS}),
    occ AS (SELECT block_idx, block_bits, count(*) AS m FROM blocks GROUP BY 1, 2)
    SELECT count(*) AS n_bands,
           max(m) AS max_band_docs,
           CAST(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_colliding_bands,
           CAST(sum(m * (m - 1) / 2) AS BIGINT) AS candidate_pairs_upper
    FROM occ
    """,
    rotation=False,
)
def dedup_simhash_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_block_stats(
        load_table(spark, sf_dir, "documents"), radius=_SIMHASH_NEAR_RADIUS
    )


# Composed corpus-cleaning pipeline — the realistic training-data flow:
# quality gate → language gate → order-insensitive dedup (keep lowest id)
# → per-source yield stats.  One plan: Catalyst fuses the gates into the
# scan and the dedup is a single window shuffle.
@query(
    "pipeline_clean_corpus",
    f"""
    WITH t AS (
        SELECT doc_id, source, text, {SQL_TOKS} AS toks FROM documents
    ), scored AS (
        SELECT doc_id, source,
               md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp,
               0.35 * least(1.0, len(toks) / 50.0)
               + 0.25 * (1.0 - length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                               / greatest(length(lower(text)), 1))
               + 0.2 * (len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in X.LANG_STOPWORDS["en"])})))
                        / greatest(len(toks), 1))
               + 0.2 * least(1.0, (coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                                   / greatest(len(toks), 1)) / 8.0) AS q
        FROM t
    ), kept AS (
        SELECT doc_id, source, fp,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM scored WHERE q >= 0.5
    )
    SELECT source,
           count(*) AS n_clean_docs,
           count(DISTINCT fp) AS n_unique
    FROM kept WHERE rn = 1
    GROUP BY source
    ORDER BY source
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        X.tokenset_fingerprint_expr().alias("fp"),
        X.quality_score_expr().alias("q"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = (
        scored.filter(F.col("q") >= 0.5)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_clean_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------
EMB_DIM = 64
KNN_QUERY_IDS = [0, 1, 2, 3, 4]

_SQL_COS = (
    "round(list_dot_product(qv, cv) / "
    "nullif(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)), 0.0), 6)"
)


@query(
    "sim_knn_brute_force",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
    pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, e.v AS cv, q.qv
        FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, {_SQL_COS} AS cosine_sim
    FROM pairs
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY {_SQL_COS} DESC, neighbor_id
    ) <= 10
    """,
    baseline_only=True,
    rotation=False,
)
def sim_knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_brute_force(emb, KNN_QUERY_IDS, k=10)


@query(
    "sim_knn_ivf",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, label FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
    pairs AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, e.v AS cv, q.qv
        FROM q JOIN e ON q.label = e.label WHERE q.query_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, {_SQL_COS} AS cosine_sim
    FROM pairs
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY {_SQL_COS} DESC, neighbor_id
    ) <= 5
    """,
    rotation=False,
)
def sim_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_ivf(emb, KNN_QUERY_IDS, k=5)


@query(
    "sim_near_dup_pairs",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v) /
                 nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0), 6)
               AS cosine_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) /
                nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0), 6)
          >= 0.4
    """,
    rotation=False,
)
def sim_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(emb, threshold=0.4)


def _sql_plane_dot(plane: list[float]) -> str:
    arr = "[" + ", ".join(repr(w) for w in plane) + "]::DOUBLE[]"
    return f"list_dot_product(embedding::DOUBLE[], {arr})"


_SQL_LSH_BITS = " || ".join(
    f"(CASE WHEN {_sql_plane_dot(plane)} > 0 THEN '1' ELSE '0' END)"
    for plane in S.plane_weights(EMB_DIM)
)


@query(
    "sim_lsh_buckets",
    f"""
    WITH b AS (SELECT vec_id, {_SQL_LSH_BITS} AS bucket FROM embeddings)
    SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM b GROUP BY bucket
    """,
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_bucket_sizes(emb, EMB_DIM)


# Deterministic train/validation/test split — hash-based (md5 of the key),
# so the assignment is reproducible across engines, runs, and cluster
# sizes; `df.sample()` seeds are implementation-specific and would never
# oracle-match.  80/10/10 by hash bucket.
@query(
    "q_train_test_split",
    """
    WITH assigned AS (
        SELECT source,
               CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80 THEN 'train'
                    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT source, split, count(*) AS n_docs
    FROM assigned
    GROUP BY source, split
    ORDER BY source, split
    """,
    rotation=False,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "split")
    )


# Tumbling-window aggregation in batch form (the streaming Q1 analog's
# exact batch twin): Spark `window()` vs DuckDB `time_bucket` — both align
# 5-minute buckets identically.
@query(
    "q_tumbling_5min",
    """
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY window_start
    """,
    rotation=False,
)
def q_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Events: sessionization, pivot, distinct aggregation
# ---------------------------------------------------------------------------
@query(
    "q_user_sessions",
    """
    WITH g AS (
        SELECT user_id,
               epoch(ts) - epoch(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap
        FROM events
    )
    SELECT user_id,
           CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sessions,
           count(*) AS n_events
    FROM g GROUP BY user_id
    """,
    rotation=False,
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        events.withColumn("gap", gap)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# Session windows (gap-merged) in batch form: Spark's `session_window`
# vs the classic gaps-and-islands SQL (lag → new-session flag → running
# sum as island id → aggregate per island).  30-minute gap.
@query(
    "q_session_windows",
    """
    WITH flagged AS (
        SELECT user_id, ts, value,
               -- gap > 1800 (strict): Spark merges an event landing exactly
               -- at prev+gap into the same session (sessions merge while
               -- new start <= current end) — verified by
               -- test_session_window_exact_boundary; gap==duration does NOT
               -- open a new session.
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS session_value
    FROM islands
    GROUP BY user_id, island
    ORDER BY user_id, session_start
    """,
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot_event_counts",
    "SELECT user_id, "
    + ", ".join(
        # 'view' is a reserved word in some dialects — prefix every pivot col
        f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(f"`{t}`"), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


@query(
    "q_distinct_users_per_type",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Custom joins Spark lacks natively (operators.joins): as-of + range.
# DuckDB's native ASOF JOIN is the oracle for the union+window formulation.
# ---------------------------------------------------------------------------
@query(
    "q_asof_join",
    """
    WITH o AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    # pre-reduce the right side to one row per (key, ts) for determinism
    o = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        o,
        key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("o_orderkey").alias("last_orderkey")
    )


PRICE_BANDS = [(0.0, 500.0, "xs"), (500.0, 1500.0, "s"), (1500.0, 3000.0, "m"),
               (3000.0, 6000.0, "l"), (6000.0, 100000.0, "xl")]

_SQL_BANDS_VALUES = ", ".join(f"({lo}, {hi}, '{nm}')" for lo, hi, nm in PRICE_BANDS)


@query(
    "q_range_join",
    f"""
    WITH bands(lo, hi, band) AS (VALUES {_SQL_BANDS_VALUES})
    SELECT b.band, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import range_join_bucketized

    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, ["lo", "hi", "band"])
    joined = range_join_bucketized(o, bands, "o_totalprice", bucket_width=500.0)
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Set operations (union / intersect / except) — reference has union only
# (T2 pd.concat); the rest round out the relational surface.
# ---------------------------------------------------------------------------
@query(
    "q_set_ops",
    """
    WITH building AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    big_spenders AS (
        SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 2000
    )
    SELECT 'union' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM building UNION SELECT c_custkey FROM big_spenders
    )
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big_spenders
    )
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (
        SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big_spenders
    )
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    spenders = (
        o.filter(F.col("o_totalprice") > 2000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )

    def count_of(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        count_of(building.union(spenders).distinct(), "union")
        .unionByName(count_of(building.intersect(spenders), "intersect"))
        .unionByName(count_of(building.exceptAll(spenders).distinct(), "except"))
    )


# Correlated EXISTS + scalar subquery + HAVING — the subquery decorrelation
# surface Catalyst rewrites into joins.
@query(
    "q_subqueries_having",
    """
    SELECT c.c_nationkey,
           count(*) AS n_customers,
           round(avg(c.c_acctbal), 4) AS avg_bal
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          )
      AND c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c.c_nationkey
    HAVING count(*) >= 2
    ORDER BY c_nationkey
    """,
)
def q_subqueries_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # sf-scoped view names: concurrent/interleaved calls with different
    # sf_dirs must not clobber each other's views
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    cv, ov = f"__c_{tag}", f"__o_{tag}"
    c.createOrReplaceTempView(cv)
    o.createOrReplaceTempView(ov)
    # the SQL form IS the DataFrame form here: spark.sql builds the same
    # Catalyst plan; EXISTS decorrelates to a left-semi join
    return spark.sql(
        f"""
        SELECT c.c_nationkey,
               count(*) AS n_customers,
               round(avg(c.c_acctbal), 4) AS avg_bal
        FROM {cv} c
        WHERE EXISTS (
                SELECT 1 FROM {ov} o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
              )
          AND c.c_acctbal > (SELECT avg(c_acctbal) FROM {cv})
        GROUP BY c.c_nationkey
        HAVING count(*) >= 2
        ORDER BY c_nationkey
        """
    )


# CASE expressions + date arithmetic + BETWEEN + IN-list.
@query(
    "q_case_dates",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 3000 THEN 'high'
                WHEN o_totalprice > 1500 THEN 'mid'
                ELSE 'low' END AS price_band,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
           (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS is_urgent
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1994-01-01 00:00:00'
                          AND TIMESTAMP '1997-12-31 23:59:59'
    """,
    rotation=False,
)
def q_case_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") > 3000, "high")
        .when(F.col("o_totalprice") > 1500, "mid")
        .otherwise("low")
    )
    return (
        o.filter(
            F.col("o_orderdate").between("1994-01-01 00:00:00", "1997-12-31 23:59:59")
        )
        .select(
            "o_orderkey",
            band.alias("price_band"),
            F.date_add(F.col("o_orderdate").cast("date"), 30)
            .cast("timestamp")
            .alias("due_date"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            )
            .cast("long")
            .alias("days_since_95"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_urgent"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary payload → pandas decode → frame explode).
# The Spark side runs real mapInPandas over a binary column; the oracle
# reproduces the deterministic stub features arithmetically (SQL never
# touches Python) — proving the plumbing end-to-end, not just the stub.
# ---------------------------------------------------------------------------
@query(
    "multimodal_features",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum,
           octet_length(encode(text)) % 640 AS fake_width,
           (octet_length(encode(text)) * 7) % 480 AS fake_height,
           octet_length(encode(text)) % 16 + 1 AS n_frames
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_payload, extract_media_features

    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(attach_payload(docs))


@query(
    "multimodal_frame_sample",
    """
    WITH f AS (
        SELECT doc_id, md5(text) AS checksum,
               octet_length(encode(text)) % 16 + 1 AS n_frames
        FROM documents
    ), x AS (
        SELECT doc_id, checksum, n_frames,
               unnest(generate_series(1, n_frames)) AS frame_idx
        FROM f
    )
    SELECT doc_id, checksum, n_frames, frame_idx,
           md5(concat(checksum, ':', frame_idx)) AS frame_hash
    FROM x
    """,
    rotation=False,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        attach_payload,
        extract_media_features,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(extract_media_features(attach_payload(docs))).select(
        "doc_id", "checksum", "n_frames", "frame_idx", "frame_hash"
    )


# TPC-H Q7-style: revenue by nation × order-year (multi-join + derived
# grouping key).  Dims broadcast; lineitem shuffles once for the final agg.
@query(
    "tpch_q7_nation_year_volume",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, order_year
    """,
)
def tpch_q7_nation_year_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("nation", "order_year")
    )


# TPC-H Q9-style: supplier-nation profit (join through the supplier dim).
@query(
    "tpch_q9_supplier_profit",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.5 * l.l_quantity * l.l_tax * 100.0), 2) AS profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def tpch_q9_supplier_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "l_quantity"
    ) * F.col("l_tax") * 100.0
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy("nation")
    )


# TPC-H Q10-style: returned-item revenue by customer (selective fact
# filter → join dims → top-k).
@query(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# TPC-H Q13-style: distribution of customers by order count (left join so
# zero-order customers count, then a second aggregation over the first).
@query(
    "tpch_q13_order_distribution",
    """
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# Grouped-map UDAF surface: per-source corpus stats via applyInPandas.
# Integer-only statistics so results are permutation-invariant (pandas sees
# group rows in shuffle order); the oracle reproduces them in SQL.
@query(
    "udaf_source_stats",
    """
    SELECT source,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(quantile_cont(n_chars, 0.5), 2) AS median_chars
    FROM documents
    GROUP BY source
    """,
)
def udaf_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        n = pdf["n_chars"]
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "min_chars": [int(n.min())],
                "max_chars": [int(n.max())],
                "total_chars": [int(n.sum())],
                "median_chars": [round(float(n.median()), 2)],
            }
        )

    return docs.select("source", "n_chars").groupBy("source").applyInPandas(
        stats,
        schema=(
            "source string, n_docs long, min_chars long, max_chars long, "
            "total_chars long, median_chars double"
        ),
    )


# TPC-H Q14-style conditional aggregation: LIKE predicate + ratio of sums
# over a lineitem⋈part join (part broadcasts).
@query(
    "tpch_q14_promo_revenue",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct")
        )
    )


# Full-outer join coverage (inner/left/semi/anti elsewhere): suppliers ⋈
# per-supplier lineitem volume, preserving both unmatched sides.
@query(
    "q_full_outer_join",
    """
    WITH vol AS (
        SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT coalesce(s.s_suppkey, v.l_suppkey) AS suppkey,
           s.s_name, v.total_qty
    FROM supplier s
    FULL OUTER JOIN vol v ON s.s_suppkey = v.l_suppkey
    ORDER BY suppkey
    """,
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_suppkey").agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    return (
        s.join(vol, s.s_suppkey == vol.l_suppkey, "full_outer")
        .select(
            F.coalesce(F.col("s_suppkey"), F.col("l_suppkey")).alias("suppkey"),
            "s_name",
            "total_qty",
        )
        .orderBy("suppkey")
    )


# Remaining window functions: lead, dense_rank, ntile, cume_dist-free set.
@query(
    "q_window_functions",
    """
    SELECT o_custkey, o_orderkey,
           coalesce(lead(o_orderkey) OVER w, -1) AS next_orderkey,
           dense_rank() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ) AS price_rank,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(F.lead("o_orderkey").over(w), F.lit(-1).cast("long")).alias(
            "next_orderkey"
        ),
        F.dense_rank().over(wp).cast("long").alias("price_rank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# Map-typed operations: build a map per user (event_type → count), then
# extract/inspect it.  Outputs are scalars so the oracle computes the same
# values without needing engine-compatible map hashing.
@query(
    "q_map_functions",
    """
    WITH per_type AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(count(*) AS INT) AS n_keys,
           CAST(coalesce(sum(n) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS n_click,
           CAST(max(n) AS BIGINT) AS max_type_count
    FROM per_type
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    # genuinely exercise MapType: collect entries → map_from_entries →
    # map_keys / element_at / map_values
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.size(F.map_keys("type_counts")).alias("n_keys"),
        F.coalesce(F.element_at("type_counts", "click"), F.lit(0)).alias("n_click"),
        F.array_max(F.map_values("type_counts")).alias("max_type_count"),
    ).orderBy("user_id")


# Exact interpolated percentiles (Spark `percentile` == DuckDB
# `quantile_cont`) — the sketch-free ordered-agg surface.
@query(
    "q_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


# CUBE grouping sets (rollup's sibling; Catalyst expands both in one pass).
@query(
    "q_cube_event_stats",
    """
    SELECT coalesce(event_type, 'ALL') AS etype,
           -- DuckDB dayofweek is 0-based (Sun=0); Spark's is 1-based (Sun=1)
           coalesce(CAST(dayofweek(ts) + 1 AS VARCHAR), 'ALL') AS dow,
           count(*) AS n_events
    FROM events
    GROUP BY CUBE (event_type, dayofweek(ts) + 1)
    ORDER BY etype, dow
    """,
)
def q_cube_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("dow_n", F.dayofweek("ts"))
        .cube("event_type", "dow_n")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("etype"),
            F.coalesce(F.col("dow_n").cast("string"), F.lit("ALL")).alias("dow"),
            "n_events",
        )
        .orderBy("etype", "dow")
    )


# Window frames: running totals (rows unbounded-preceding), moving average
# (rows -2..0), first_value — the frame-spec surface Q3's rank doesn't touch.
@query(
    "q_running_totals",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
           first_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order
    FROM orders
    """,
    rotation=False,
)
def q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "moving_avg_3"
        ),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


# TPC-H Q12-style: conditional counts by priority class per order status.
@query(
    "tpch_q12_priority_by_status",
    """
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("o_orderstatus")
    )


# TPC-H Q18-style: large-volume orders — HAVING on a child aggregate, then
# join back to the parent (aggregate-then-join, the anti-pattern-free order).
@query(
    "tpch_q18_large_orders",
    """
    WITH big AS (
        SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, b.total_qty
    FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
    ORDER BY b.total_qty DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.sum("l_quantity").alias("__raw_qty"),
        )
        .filter(F.col("__raw_qty") > 150)
        .drop("__raw_qty")
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


# Unpivot (stack) — the inverse of q_pivot_event_counts: wide per-type
# counts back to long (user_id, event_type, n) form.
@query(
    "q_unpivot_event_counts",
    "WITH wide AS (SELECT user_id, "
    + ", ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id) "
    + " UNION ALL ".join(
        f"SELECT user_id, '{t}' AS event_type, n_{t} AS n FROM wide"
        for t in EVENT_TYPES
    ),
)
def q_unpivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q_pivot_event_counts(spark, sf_dir)
    stack_args = ", ".join(f"'{t}', n_{t}" for t in EVENT_TYPES)
    return wide.selectExpr(
        "user_id",
        f"stack({len(EVENT_TYPES)}, {stack_args}) AS (event_type, n)",
    )


# JSON extraction from the events.props payload column (semi-structured
# surface: get_json_object / from_json, pushdown-friendly scalar path).
@query(
    "q_json_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS total_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("total_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Scalar-function parity sweep (math / string / date kernels)
# ---------------------------------------------------------------------------
@query(
    "q_scalar_functions",
    """
    SELECT o_orderkey,
           abs(o_totalprice - 1000.0) AS abs_diff,
           round(sqrt(o_totalprice), 6) AS sqrt_price,
           CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
           CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
           round(ln(o_totalprice + 1.0), 6) AS log_price,
           upper(o_orderstatus) AS status_upper,
           substr(o_orderpriority, 1, 3) AS prio3,
           CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
           concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_day
    FROM orders
    """,
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 1000.0).alias("abs_diff"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        F.ceil("o_totalprice").alias("ceil_price"),
        F.floor("o_totalprice").alias("floor_price"),
        F.round(F.log(F.col("o_totalprice") + 1.0), 6).alias("log_price"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 3).alias("prio3"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
    )


# Approximate sketches, driver-gated.  The sketch values themselves are
# engine-specific (HLL++ / KLL registers), so the query emits for each
# metric (a) the EXACT value — which the oracle recomputes in SQL — and
# (b) a within_bounds verdict comparing the sketch against the exact value
# under the documented tolerance.  The oracle asserts TRUE, so a sketch
# drifting out of tolerance becomes a hash mismatch at the driver gate.
# Scale note: four whole-table sketch aggregates, all map-side partial —
# the 1x1 crossJoin just zips two scalar agg rows.
@query(
    "q_approx_stats",
    """
    WITH e AS (
        SELECT count(DISTINCT user_id) AS du, count(DISTINCT event_type) AS det
        FROM events
    ), l AS (
        SELECT quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.9) AS p90
        FROM lineitem
    )
    SELECT metric, round(exact_value, 4) AS exact_value, TRUE AS within_bounds
    FROM (
        SELECT 'distinct_event_types' AS metric, det::DOUBLE AS exact_value FROM e
        UNION ALL SELECT 'distinct_users', du::DOUBLE FROM e
        UNION ALL SELECT 'p50_price', p50 FROM l
        UNION ALL SELECT 'p90_price', p90 FROM l
    )
    ORDER BY metric
    """,
)
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    events = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    e = events.agg(
        F.countDistinct("user_id").cast("double").alias("du"),
        F.approx_count_distinct("user_id", rsd=0.02).cast("double").alias("du_a"),
        F.countDistinct("event_type").cast("double").alias("det"),
        F.approx_count_distinct("event_type", rsd=0.02).cast("double").alias("det_a"),
    )
    l = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).cast("double").alias("p50_a"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).cast("double").alias("p90_a"),
    )
    one = e.crossJoin(l)

    def verdict(metric: str, exact: str, approx: str, tol):
        return one.select(
            F.lit(metric).alias("metric"),
            F.round(F.col(exact), 4).alias("exact_value"),
            (F.abs(F.col(approx) - F.col(exact)) <= tol).alias("within_bounds"),
        )

    rows = [
        verdict(
            "distinct_event_types", "det", "det_a",
            F.greatest(F.lit(3.0), F.col("det") * 0.05),
        ),
        verdict(
            "distinct_users", "du", "du_a",
            F.greatest(F.lit(3.0), F.col("du") * 0.05),
        ),
        verdict("p50_price", "p50", "p50_a", F.col("p50") * 0.01),
        verdict("p90_price", "p90", "p90_a", F.col("p90") * 0.01),
    ]
    return reduce(lambda a, b: a.unionByName(b), rows).orderBy("metric")


# Forward as-of join: for each event, the EARLIEST order at-or-after it
# per user.  Oracle: DuckDB's native forward ASOF (ts <= orderdate picks
# the smallest qualifying right ts).  Same one-shuffle window plan as the
# backward direction.
@query(
    "q_asof_forward",
    """
    WITH o AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS next_orderkey
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    """,
    rotation=False,
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        o,
        key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("o_orderkey").alias("next_orderkey")
    )


# Nearest as-of join under a 30-day tolerance (pandas merge_asof
# direction='nearest' + tolerance): closest order date either side of the
# event, ties to backward, no match beyond the tolerance.  Oracle: both
# ASOF directions + CASE arbitration with epoch() deltas.
_ASOF_TOL_S = 30 * 86400


@query(
    "q_asof_nearest_tolerance",
    f"""
    WITH o AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    ),
    b AS (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey AS bk, epoch(e.ts) - epoch(o.o_orderdate) AS bd
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ),
    f AS (
        SELECT e.event_id,
               o.o_orderkey AS fk, epoch(o.o_orderdate) - epoch(e.ts) AS fd
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    ),
    j AS (
        SELECT b.event_id, b.user_id, b.ts,
               CASE WHEN bd <= {_ASOF_TOL_S} THEN bk END AS bk,
               CASE WHEN bd <= {_ASOF_TOL_S} THEN bd END AS bd,
               CASE WHEN fd <= {_ASOF_TOL_S} THEN fk END AS fk,
               CASE WHEN fd <= {_ASOF_TOL_S} THEN fd END AS fd
        FROM b JOIN f ON b.event_id = f.event_id
    )
    SELECT event_id, user_id, ts,
           CASE WHEN bk IS NULL THEN fk
                WHEN fk IS NULL THEN bk
                WHEN bd <= fd THEN bk
                ELSE fk END AS nearest_orderkey
    FROM j
    """,
    rotation=False,
)
def q_asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        o,
        key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
        direction="nearest",
        tolerance=_ASOF_TOL_S,
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("o_orderkey").alias("nearest_orderkey")
    )


# ---------------------------------------------------------------------------
# Round-2 relational widening: EXISTS/decorrelation-heavy TPC-H analogs
# (the testdata has no partsupp/commitdate, so Q4/Q16/Q17/Q21/Q22 are
# restated on the available columns with the same operator shapes).
# ---------------------------------------------------------------------------

# Q4-style: EXISTS with a non-equi correlated predicate -> left-semi join.
# Scale: semi join shuffles on orderkey only; no payload duplication.
@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# Q16-style: distinct-aggregate after a filtered dim join (no partsupp:
# lineitem is the part->supplier link).  NOT LIKE prunes at the part scan.
@query(
    "tpch_q16_supplier_cnt",
    """
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type NOT LIKE 'MEDIUM%'
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (~F.col("p_type").like("MEDIUM%"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


# Q17-style: correlated scalar subquery (per-part avg threshold),
# decorrelated into aggregate-then-join — Catalyst's own rewrite, stated
# explicitly.  Scale: the avg frame is |parts|, joins on partkey.
@query(
    "tpch_q17_small_quantity",
    """
    WITH avgq AS (
        SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_weekly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avgq a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.qty_lim
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avgq = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_lim")
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avgq.withColumnRenamed("l_partkey", "a_partkey"),
              F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
    )
    return joined.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly")
    )


# Q21-style: the EXISTS + NOT-EXISTS double correlation ("supplier kept
# the order waiting alone"), late = shipped after the order date.  Spark
# form: one semi join (another supplier exists in the order) + one anti
# join (no OTHER supplier shipped late) — both shuffle on orderkey.
@query(
    "tpch_q21_waiting_supplier",
    """
    WITH ofl AS (
        SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ),
    late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN ofl o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    ofl = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = (
        li.join(ofl, li.l_orderkey == ofl.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    cand = late.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("y_orderkey"))
        & (F.col("l_suppkey") != F.col("y_suppkey")),
        "left_anti",
    )
    return (
        cand.join(s, cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# Q22-style: global scalar subquery threshold + activity predicate via a
# left-joined pre-aggregate (the decorrelated NOT-EXISTS-count form).
@query(
    "tpch_q22_low_activity",
    """
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    ),
    cnt AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey),
    rich AS (
        SELECT c.* FROM customer c CROSS JOIN avg_bal a
        WHERE c.c_acctbal > a.ab
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM rich c
    LEFT JOIN cnt ON cnt.o_custkey = c.c_custkey
    WHERE coalesce(cnt.n, 0) <= 2
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def tpch_q22_low_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    cnt = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .join(cnt, c.c_custkey == cnt.o_custkey, "left")
        .filter(
            (F.col("c_acctbal") > F.col("ab"))
            & (F.coalesce(F.col("n"), F.lit(0)) <= 2)
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Sliding windows + hypertable-style rollup cascade
# ---------------------------------------------------------------------------

# Sliding 15-minute window every 5 minutes: each event lands in exactly 3
# windows.  The oracle expands events x [0,1,2] and re-buckets — the
# relational definition of Spark's F.window(slide).
@query(
    "q_sliding_15m_5m",
    """
    WITH s AS (
        SELECT time_bucket(INTERVAL 5 MINUTE, e.ts) - k.k * INTERVAL 5 MINUTE
                   AS window_start,
               e.value
        FROM events e CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
    )
    SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM s
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def q_sliding_15m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "15 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# Hypertable-style rollup cascade: minute -> hour -> day, each level
# aggregated FROM THE PREVIOUS LEVEL (continuous-aggregate shape), one
# scan of the fact table total.  Decimal sums make the cascade exactly
# associative, so the oracle can aggregate each level directly.
@query(
    "q_rollup_cascade",
    """
    WITH m AS (
        SELECT date_trunc('minute', ts) AS bucket,
               count(*) AS n_events,
               sum(value::DECIMAL(18, 6)) AS sv
        FROM events GROUP BY 1
    ),
    h AS (
        SELECT date_trunc('hour', bucket) AS bucket,
               CAST(sum(n_events) AS BIGINT) AS n_events, sum(sv) AS sv
        FROM m GROUP BY 1
    ),
    d AS (
        SELECT date_trunc('day', bucket) AS bucket,
               CAST(sum(n_events) AS BIGINT) AS n_events, sum(sv) AS sv
        FROM h GROUP BY 1
    )
    SELECT level, bucket, n_events,
           CAST(round(sv, 2) AS DOUBLE) AS total_value
    FROM (
        SELECT 'minute' AS level, * FROM m
        UNION ALL SELECT 'hour', * FROM h
        UNION ALL SELECT 'day', * FROM d
    )
    ORDER BY level, bucket
    """,
    rotation=False,
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # each level is MATERIALIZED (cache here; a table per level at real
    # scale — that is what a continuous aggregate is): without it every
    # union branch re-derives its input subtree and the fact table is
    # scanned once per level (3 scans, plan-gated down to 1).
    minute = register_cache(
        events.groupBy(F.date_trunc("minute", "ts").alias("bucket")).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )
    )
    hour = register_cache(
        minute.groupBy(F.date_trunc("hour", "bucket").alias("bucket")).agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sv").alias("sv"),
        )
    )
    day = hour.groupBy(F.date_trunc("day", "bucket").alias("bucket")).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sv").alias("sv"),
    )
    out = (
        minute.select(F.lit("minute").alias("level"), "bucket", "n_events", "sv")
        .unionByName(hour.select(F.lit("hour").alias("level"), "bucket", "n_events", "sv"))
        .unionByName(day.select(F.lit("day").alias("level"), "bucket", "n_events", "sv"))
    )
    return out.select(
        "level",
        "bucket",
        "n_events",
        F.round("sv", 2).cast("double").alias("total_value"),
    ).orderBy("level", "bucket")


# Multimodal resize plumbing: binary -> binary through mapInPandas with a
# deterministic stub codec.  The oracle reproduces the numeric metadata
# (byte budget arithmetic); the binary contract itself is unit-tested.
@query(
    "multimodal_resize",
    """
    SELECT doc_id,
           CAST(224 AS BIGINT) AS width,
           CAST(224 AS BIGINT) AS height,
           CAST(least(octet_length(encode(text)), 784) AS BIGINT) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_payload, resize_media

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_media(attach_payload(docs), 224, 224)
    return resized.select("doc_id", "width", "height", "n_bytes").orderBy("doc_id")


# REAL decode path (operators/codecs.py: dependency-free 24-bit BMP):
# synthetic per-doc BMPs — dims (4+id%13)×(4+id%11), constant fill color
# md5(str(id))[:3] — are genuinely parsed by the decoder; the oracle
# reproduces the header arithmetic (54-byte headers + 4-byte-padded BGR
# rows) and the md5-derived dims from doc_id alone.
@query(
    "multimodal_real_decode",
    """
    SELECT doc_id,
           CAST(4 + doc_id % 13 AS BIGINT) AS width,
           CAST(4 + doc_id % 11 AS BIGINT) AS height,
           CAST(54 + (4 + doc_id % 11) * ((3 * (4 + doc_id % 13) + 3) // 4 * 4)
                AS BIGINT) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_bmp_payload, extract_media_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(attach_bmp_payload(docs), use_real_codecs=True)
    return feats.select("doc_id", "width", "height", "n_bytes").orderBy("doc_id")


# The full chain — encode → decode → nearest-neighbor resample → re-encode
# → re-decode — with content verification: the constant fill color must
# survive to the channel means of the re-decoded 16×16 output (exact
# integers for constant-fill fixtures).  16×16 stride is 48 (already
# 4-aligned): n_bytes = 54 + 16*48 = 822 for every doc.
@query(
    "multimodal_resize_real",
    """
    SELECT doc_id,
           CAST(16 AS BIGINT) AS width,
           CAST(16 AS BIGINT) AS height,
           CAST(822 AS BIGINT) AS n_bytes,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) AS mean_r,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 3, 2) AS BIGINT) AS mean_g,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 2) AS BIGINT) AS mean_b
    FROM documents
    ORDER BY doc_id
    """,
    rotation=False,
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        attach_bmp_payload,
        media_pixel_stats,
        resize_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_media(attach_bmp_payload(docs), 16, 16, use_real_codecs=True)
    return media_pixel_stats(resized).orderBy("doc_id")


# AUDIO modality through the REAL PCM16 WAV codec (operators/codecs.py):
# synthetic per-doc mono WAVs — 64+id%97 samples at 8 kHz, constant
# amplitude md5(str(id))[:2]-32768 — genuinely parsed by the RIFF chunk
# walker; the oracle reproduces the header arithmetic (44 canonical
# header bytes + 2 bytes/sample) and the md5-derived amplitude from
# doc_id alone.
@query(
    "multimodal_audio_decode",
    """
    SELECT doc_id,
           CAST(44 + 2 * (64 + doc_id % 97) AS BIGINT) AS n_bytes,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(64 + doc_id % 97 AS BIGINT) AS n_samples,
           CAST(1 AS BIGINT) AS n_channels,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) - 32768
               AS mean_amp
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_wav_payload, extract_audio_features

    docs = load_table(spark, sf_dir, "documents")
    return extract_audio_features(attach_wav_payload(docs)).orderBy("doc_id")


# The full audio chain — encode → decode → nearest-neighbor resample
# (8 kHz → 4 kHz, sample-and-hold) → re-encode → re-decode — with content
# verification: the constant amplitude must survive to the mean of the
# re-decoded stream.  n_out = floor(n/2); constant fill makes the mean
# exact.
@query(
    "multimodal_audio_resample",
    """
    SELECT doc_id,
           CAST(44 + 2 * ((64 + doc_id % 97) // 2) AS BIGINT) AS n_bytes,
           CAST(4000 AS BIGINT) AS sample_rate,
           CAST((64 + doc_id % 97) // 2 AS BIGINT) AS n_samples,
           CAST(1 AS BIGINT) AS n_channels,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) - 32768
               AS mean_amp
    FROM documents
    ORDER BY doc_id
    """,
    rotation=False,
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        attach_wav_payload,
        extract_audio_features,
        resample_audio,
    )

    docs = load_table(spark, sf_dir, "documents")
    resampled = resample_audio(attach_wav_payload(docs), 4000)
    return extract_audio_features(resampled).orderBy("doc_id")


# Waveform ANALYSIS over decoded PCM — the feature-extraction step after
# decode (loudness / activity gating, the audio quality-filter
# primitives).  The square-wave fixture (+a, -a alternating,
# a = md5_16(id) % 32768) makes every statistic an integer-exact closed
# form: peak = a, energy = n*a^2 (exact BIGINT, no float accumulation),
# zero crossings = n-1 strict sign flips for a > 0, silence = n iff
# a = 0.  A decode reading wrong offsets breaks the alternation and
# mismatches zero_crossings; a stats pass dropping samples mismatches
# energy.
@query(
    "multimodal_audio_stats",
    """
    WITH p AS (
        SELECT doc_id,
               CAST(64 + doc_id % 97 AS BIGINT) AS n,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
                   % 32768 AS a
        FROM documents
    )
    SELECT doc_id,
           n AS n_samples,
           a AS peak_amp,
           n * a * a AS energy,
           CASE WHEN a > 0 THEN n - 1 ELSE CAST(0 AS BIGINT) END AS zero_crossings,
           CASE WHEN a = 0 THEN n ELSE CAST(0 AS BIGINT) END AS n_silent
    FROM p
    ORDER BY doc_id
    """,
    rotation=False,
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        attach_wav_square_payload,
        extract_audio_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_audio_stats(attach_wav_square_payload(docs)).orderBy("doc_id")


# Image perceptual hashing — average-hash over genuinely decoded BMP
# pixels, 60 bits so the signature is drop-in compatible with the text
# SimHash pigeonhole machinery.  The gradient fixture makes every bit a
# closed form: pixel r has gray (md5_16(a:r) + [r == doc_id % 60]·128)
# % 256 with a = md5_16(doc_id) % 256 (the +128 is the planted edit),
# and the over-mean test is division-free (60·v > Σv) — the oracle
# rebuilds the exact hash from doc_id arithmetic alone, so a decoder
# reading the wrong byte order or a hash pass using a float mean
# mismatches bit-for-bit.
_AHASH_ORACLE_CTE = """
    base AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
                   % 256 AS a
        FROM documents
    ),
    px AS (
        SELECT d.doc_id,
               r.r,
               (CAST('0x' || substr(md5(CAST(d.a AS VARCHAR) || ':'
                                        || CAST(r.r AS VARCHAR)), 1, 4) AS BIGINT)
                    % 256
                + CASE WHEN r.r = d.doc_id % 60 THEN 128 ELSE 0 END) % 256 AS v
        FROM base d,
             (SELECT unnest(generate_series(0, 59)) AS r) r
    ),
    tot AS (SELECT doc_id, SUM(v) AS s FROM px GROUP BY doc_id),
    sig AS (
        SELECT px.doc_id,
               string_agg(CASE WHEN 60 * px.v > tot.s THEN '1' ELSE '0' END,
                          '' ORDER BY px.r) AS simhash,
               CAST(SUM(CASE WHEN 60 * px.v > tot.s
                             THEN CAST(1 AS BIGINT) << (59 - px.r)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS h
        FROM px JOIN tot USING (doc_id)
        GROUP BY px.doc_id
    )
"""


@query(
    "multimodal_image_ahash",
    f"""
    WITH {_AHASH_ORACLE_CTE}
    SELECT doc_id, simhash, h FROM sig ORDER BY doc_id
    """,
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_gradient_bmp_payload, image_ahash

    docs = load_table(spark, sf_dir, "documents")
    return image_ahash(attach_gradient_bmp_payload(docs)).orderBy("doc_id")


# Image NEAR-DUP pairs: aHash + the shared hamming pigeonhole-block
# join (dedup.bitsig_near_pairs) — visual dedup with the text-dedup
# plan shape (block equi-join, popcount verify map-side, no cartesian).
# The oracle goes quadratic on purpose (500 docs at the gate SF): exact
# hamming over all pairs is the ground truth the pigeonhole join must
# reproduce COMPLETELY — any pair the block join misses is a
# correctness failure, not a recall tradeoff.
@query(
    "multimodal_image_near_dup",
    baseline_only=True,
    oracle=f"""
    WITH {_AHASH_ORACLE_CTE}
    SELECT a.doc_id AS doc_a,
           b.doc_id AS doc_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= 4
    ORDER BY doc_a, doc_b
    """,
    rotation=False,
)
def multimodal_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        attach_gradient_bmp_payload,
        image_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return image_near_dup_pairs(
        attach_gradient_bmp_payload(docs), radius=4
    ).orderBy("doc_a", "doc_b")


# Capped scale-default twin (the dedup_simhash_near_capped pattern for
# images): blocks over the cap are dropped BEFORE the self-join — the
# skew guard for boilerplate imagery (logos, watermarks, blank frames)
# whose identical hashes would otherwise make one block quadratic.  The
# cap is deliberately tight (3) so the drop path is oracle-exercised at
# the driver's gate SF: the fixture's base-image groups are ~2 docs at
# sf0.01, so real groups of 4+ exist and ARE dropped, and the oracle
# reproduces exactly that.
_AHASH_MAX_BLOCK = 3
_SQL_AHASH_BLOCKS = " UNION ALL ".join(
    f"SELECT doc_id, h, {i} AS block_idx, "
    f"substr(simhash, {pos}, {ln}) AS block_bits FROM sig"
    for i, (pos, ln) in enumerate(D.simhash_blocks(4))
)


@query(
    "multimodal_image_near_dup_capped",
    f"""
    WITH {_AHASH_ORACLE_CTE},
    blocks AS ({_SQL_AHASH_BLOCKS}),
    kept AS (
        SELECT b.* FROM blocks b
        JOIN (SELECT block_idx, block_bits FROM blocks
              GROUP BY 1, 2 HAVING count(*) <= {_AHASH_MAX_BLOCK}) ok
        USING (block_idx, block_bits)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM kept a
    JOIN kept b ON a.block_idx = b.block_idx AND a.block_bits = b.block_bits
                AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= 4
    """,
)
def multimodal_image_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        attach_gradient_bmp_payload,
        image_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return image_near_dup_pairs(
        attach_gradient_bmp_payload(docs), radius=4, max_block_size=_AHASH_MAX_BLOCK
    )


# VIDEO modality through the REAL BMV container (operators/codecs.py): a
# header-indexed stream of equal-size BMP frames.  Fixture per doc:
# 2+id%7 frames of (4+id%13)×(4+id%11); the oracle reproduces the
# container arithmetic — 12 header bytes + n_frames × (54 + h × 4-padded
# BGR stride) — from doc_id alone, while the operator genuinely parses
# the header and decodes frame 0.
@query(
    "multimodal_video_info",
    """
    SELECT doc_id,
           CAST(12 + (2 + doc_id % 7) *
                (54 + (4 + doc_id % 11) * ((3 * (4 + doc_id % 13) + 3) // 4 * 4))
                AS BIGINT) AS n_bytes,
           CAST(2 + doc_id % 7 AS BIGINT) AS n_frames,
           CAST(4 + doc_id % 13 AS BIGINT) AS width,
           CAST(4 + doc_id % 11 AS BIGINT) AS height
    FROM documents
    ORDER BY doc_id
    """,
    rotation=False,
)
def multimodal_video_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_video_payload, extract_video_info

    docs = load_table(spark, sf_dir, "documents")
    return extract_video_info(attach_video_payload(docs)).orderBy("doc_id")


# Every-2nd-frame sampling with REAL random-access decode: frame f of doc
# id is constant-filled md5(f"{id}:{f}")[:3], so the decoded channel
# means of exactly the SAMPLED frames (0, 2, 4, …) are reproducible in
# SQL — a decoder that read the wrong frame offset would mismatch every
# odd-indexed color.  The unsampled frames are never parsed (seek
# arithmetic), which is the 100 TB point of the container format.
@query(
    "multimodal_video_frames",
    """
    WITH fr AS (
        SELECT doc_id,
               unnest(generate_series(0, CAST(1 + doc_id % 7 AS BIGINT))) AS frame_idx
        FROM documents
    )
    SELECT doc_id, frame_idx,
           CAST(4 + doc_id % 13 AS BIGINT) AS width,
           CAST(4 + doc_id % 11 AS BIGINT) AS height,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                CAST(frame_idx AS VARCHAR)), 1, 2) AS BIGINT) AS mean_r,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                CAST(frame_idx AS VARCHAR)), 3, 2) AS BIGINT) AS mean_g,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                CAST(frame_idx AS VARCHAR)), 5, 2) AS BIGINT) AS mean_b
    FROM fr
    WHERE frame_idx % 2 = 0
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_video_payload, sample_video_frames_real

    docs = load_table(spark, sf_dir, "documents")
    return sample_video_frames_real(attach_video_payload(docs), every_k=2).orderBy(
        "doc_id", "frame_idx"
    )


# Real IVF ANN: geometric coarse quantizer (sampled centroids, inlined as
# plan literals) + multi-probe.  The label-cell variant above answers
# "nearest within my class"; THIS is the global-ANN scale path, and its
# recall vs brute force is measured, not assumed (tools/ann_recall.py:
# recall@10 recorded in SCALE.md).  Oracle reproduces the assignment
# argmax (sim DESC, cid DESC) and the probe top-2 exactly.
@query(
    "sim_knn_ivf_mp",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS c_id, v AS cvv FROM e WHERE vec_id < {S.N_IVF_CELLS}),
    csims AS (
        SELECT e.vec_id, c.c_id,
               round(list_dot_product(e.v, c.cvv) /
                     nullif(sqrt(list_dot_product(e.v, e.v)) *
                            sqrt(list_dot_product(c.cvv, c.cvv)), 0.0), 6) AS csim
        FROM e CROSS JOIN cent c
    ),
    assign AS (
        SELECT vec_id, c_id AS cell FROM csims
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) = 1
    ),
    probe AS (
        SELECT vec_id AS query_id, c_id AS cell FROM csims
        WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) <= {S.IVF_PROBES}
    ),
    pairs AS (
        SELECT p.query_id, a.vec_id AS neighbor_id, qe.v AS qv, e2.v AS cv
        FROM probe p
        JOIN assign a ON a.cell = p.cell
        JOIN e qe ON qe.vec_id = p.query_id
        JOIN e e2 ON e2.vec_id = a.vec_id
        WHERE p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, {_SQL_COS} AS cosine_sim
    FROM pairs
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY {_SQL_COS} DESC, neighbor_id) <= 10
    """,
)
def sim_knn_ivf_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_ivf_centroids(emb, KNN_QUERY_IDS, k=10)


# Global embedding near-dup on the geometric quantizer: top-2 cell
# multi-assignment -> per-cell pair join -> exact cosine verify.  The
# label-blocked variant above is within-class; this one is corpus-global.
@query(
    "sim_near_dup_ivf",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
        SELECT vec_id AS c_id, v AS cvv, sqrt(list_dot_product(v, v)) AS cnorm
        FROM e WHERE vec_id < {S.N_IVF_CELLS}
    ),
    vn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vnorm FROM e),
    csims AS (
        SELECT vn.vec_id, c.c_id,
               round(list_dot_product(vn.v, c.cvv) /
                     nullif(vn.vnorm * c.cnorm, 0.0), 6) AS csim
        FROM vn CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id, c_id AS cell FROM csims
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) <= 2
    ),
    pairs AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT p.vec_a, p.vec_b,
           round(list_dot_product(ea.v, eb.v) /
                 nullif(sqrt(list_dot_product(ea.v, ea.v)) *
                        sqrt(list_dot_product(eb.v, eb.v)), 0.0), 6) AS cosine_sim
    FROM pairs p
    JOIN e ea ON ea.vec_id = p.vec_a
    JOIN e eb ON eb.vec_id = p.vec_b
    WHERE round(list_dot_product(ea.v, eb.v) /
                nullif(sqrt(list_dot_product(ea.v, ea.v)) *
                       sqrt(list_dot_product(eb.v, eb.v)), 0.0), 6) >= 0.45
    """,
)
def sim_near_dup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # synthetic embeddings top out near cosine 0.51 (measured), so the
    # near-dup band for this data is >= 0.45 (the label-blocked variant
    # uses 0.4)
    return S.embedding_near_dup_ivf(emb, threshold=0.45)


# Column profiling — the data-quality report a training-data pipeline
# runs before ingesting a new source: one pass over the table, per-column
# null rate / distinct count / min / max.  One hash aggregate (all stats
# partial-aggregate map-side); the unpivot to (column, stat) rows happens
# on the single result row.
@query(
    "q_profile_events",
    """
    WITH s AS (
        SELECT count(*) AS n,
               count(user_id) AS nn_user, count(DISTINCT user_id) AS nd_user,
               CAST(min(user_id) AS DOUBLE) AS mn_user,
               CAST(max(user_id) AS DOUBLE) AS mx_user,
               count(event_type) AS nn_type, count(DISTINCT event_type) AS nd_type,
               count(value) AS nn_value, count(DISTINCT value) AS nd_value,
               min(value) AS mn_value, max(value) AS mx_value
        FROM events
    )
    SELECT col, n_rows, null_rate, n_distinct, min_value, max_value
    FROM (
        SELECT 'event_type' AS col, n AS n_rows,
               round(1.0 - nn_type / n, 6) AS null_rate,
               nd_type AS n_distinct,
               CAST(NULL AS DOUBLE) AS min_value, CAST(NULL AS DOUBLE) AS max_value
        FROM s
        UNION ALL
        SELECT 'user_id', n, round(1.0 - nn_user / n, 6), nd_user, mn_user, mx_user FROM s
        UNION ALL
        SELECT 'value', n, round(1.0 - nn_value / n, 6), nd_value, mn_value, mx_value FROM s
    )
    ORDER BY col
    """,
)
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    s = events.agg(
        F.count("*").alias("n"),
        F.count("user_id").alias("nn_user"),
        F.countDistinct("user_id").alias("nd_user"),
        F.min("user_id").cast("double").alias("mn_user"),
        F.max("user_id").cast("double").alias("mx_user"),
        F.count("event_type").alias("nn_type"),
        F.countDistinct("event_type").alias("nd_type"),
        F.count("value").alias("nn_value"),
        F.countDistinct("value").alias("nd_value"),
        F.min("value").alias("mn_value"),
        F.max("value").alias("mx_value"),
    )

    def row(col, nn, nd, mn, mx):
        return s.select(
            F.lit(col).alias("col"),
            F.col("n").alias("n_rows"),
            F.round(F.lit(1.0) - F.col(nn) / F.col("n"), 6).alias("null_rate"),
            F.col(nd).alias("n_distinct"),
            (F.col(mn) if mn else F.lit(None)).cast("double").alias("min_value"),
            (F.col(mx) if mx else F.lit(None)).cast("double").alias("max_value"),
        )

    out = (
        row("event_type", "nn_type", "nd_type", None, None)
        .unionByName(row("user_id", "nn_user", "nd_user", "mn_user", "mx_user"))
        .unionByName(row("value", "nn_value", "nd_value", "mn_value", "mx_value"))
    )
    return out.orderBy("col")


# Q15-style: top supplier by revenue — aggregate CTE + scalar subquery on
# that same aggregate in the WHERE (argmax without a window).  Catalyst
# evaluates the scalar subquery once and broadcasts the single value.
@query(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("__top"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__top"))
        .join(s, revenue.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H completion: Q2 / Q8 / Q11 / Q20 analogs.  The testdata has no
# partsupp table, so (as in tpch_q16) lineitem serves as the part<->supplier
# link and unit cost / availability are derived from its measures.  With
# these, all 22 TPC-H query shapes have an oracle-checked analog.
# ---------------------------------------------------------------------------

# Q2-style: min-cost supplier per part within a region — the correlated
# MIN subquery, decorrelated into an aggregate + per-part rank.  We rank
# (row_number over partkey ordered by cost, suppkey) instead of equality-
# joining on the float minimum: same semantics, deterministic ties, and no
# float-equality join.  unit_cost ships UNROUNDED: min() is
# order-independent, so both engines produce the bit-identical double,
# whereas round() at a representational .xxxx5 boundary resolves
# differently (Spark rounds the shortest decimal string, DuckDB the
# binary value) — observed as a last-ulp mismatch at sf0.001.
# Scale: cost agg shuffles on (partkey, suppkey);
# part filter + region dims broadcast; the window partitions on partkey —
# no skew (each part has few suppliers).
@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name,
               c.unit_cost,
               row_number() OVER (
                   PARTITION BY p.p_partkey
                   ORDER BY c.unit_cost, c.l_suppkey
               ) AS rn
        FROM part p
        JOIN cost c ON c.l_partkey = p.p_partkey
        JOIN eu e ON e.s_suppkey = c.l_suppkey
        WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 25
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM ranked WHERE rn = 1
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 25)
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              n.n_regionkey == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "l_suppkey")
    return (
        cost.join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(eu, cost.l_suppkey == eu.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost"
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# Q8-style: national market share — the 8-relation star join with a
# conditional-sum / sum ratio per year.  Scale: lineitem⋈orders shuffles
# on orderkey; every dim (part, supplier, nation x2, customer via region
# prune, region) broadcasts; the final agg has |years| groups — total
# map-side combine.  The ratio-of-sums is rounded because the two engines
# sum in different orders.
@query(
    "tpch_q8_market_share",
    """
    WITH rev AS (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM rev GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    cust_am = (
        c.join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(cust_am), o.o_custkey == cust_am.c_custkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(0.0)
    return (
        rev.groupBy("o_year")
        .agg(F.round(F.sum(nat) / F.sum("volume"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


# Q11-style: "important stock" — per-part value for one nation's suppliers
# kept only where it exceeds a global scalar-subquery threshold.  TPC-H's
# fixed fraction (0.0001) is defined relative to SF; a constant fraction
# here would shrink to zero rows as data grows, so the scale-invariant
# restatement is "value > 2x the mean part value" — same plan shape
# (aggregate + broadcast scalar), output proportional to |parts| at every
# SF.  Scale: one agg keyed on partkey, the scalar broadcasts; no window,
# no quadratic step.  No LIMIT: the cutoff is the only float comparison,
# so the output set is stable without a rank over un-rounded doubles.
@query(
    "tpch_q11_important_parts",
    """
    WITH val AS (
        SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY 1
    ),
    tot AS (SELECT 2.0 * avg(value) AS thr FROM val)
    SELECT v.l_partkey AS p_partkey, round(v.value, 2) AS value
    FROM val v CROSS JOIN tot
    WHERE v.value > tot.thr
    ORDER BY value DESC, p_partkey
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                            .select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    tot = val.agg((2.0 * F.avg("value")).alias("thr"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


# Q20-style: suppliers with "excess availability" — kept if, for some part
# they ship whose name matches the prefix, their 1997 shipped quantity
# exceeds 30% of their all-time quantity for that part.  The reference
# shape is the doubly-nested IN subquery; here it decorrelates into one
# conditional aggregate per (partkey, suppkey) + a semi join.  Scale: one
# shuffle keyed (partkey, suppkey), part filter broadcasts, semi join on
# suppkey; quantities are exact integral doubles so the 0.3 cutoff is
# order-independent.
@query(
    "tpch_q20_excess_suppliers",
    """
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               sum(CASE WHEN l_shipdate >= DATE '1997-01-01'
                         AND l_shipdate < DATE '1998-01-01'
                        THEN l_quantity ELSE 0 END) AS qty_1997,
               sum(l_quantity) AS qty_all
        FROM lineitem GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT sh.l_suppkey
        FROM shipped sh JOIN part p ON p.p_partkey = sh.l_partkey
        WHERE p.p_name LIKE 'small%' AND sh.qty_1997 > 0.3 * sh.qty_all
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN cand ON cand.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_1'
    ORDER BY s_name
    """,
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    in_97 = F.col("l_shipdate").between("1997-01-01", "1997-12-31 23:59:59.999999")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(in_97, F.col("l_quantity")).otherwise(0.0)).alias("qty_1997"),
        F.sum("l_quantity").alias("qty_all"),
    )
    cand = (
        shipped.join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .filter(F.col("qty_1997") > 0.3 * F.col("qty_all"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(cand, s.s_suppkey == cand.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Round-2 training-pipeline widening: repetition-ratio quality signals and
# deterministic stratified sampling.
# ---------------------------------------------------------------------------

# Gopher-style repetition signals (Rae et al. 2021, arXiv:2112.11446 §A1.1):
# highly repetitive documents are low-quality training data.  Per document:
# the duplicate-bigram fraction and the most-frequent-bigram share.  Shape:
# one explode + an agg keyed (doc_id, bigram) + an agg keyed doc_id — both
# partial-aggregated map-side; nothing leaves the JVM.  At 100 TB the
# (doc_id, bigram) shuffle is bounded by total token count, the same order
# as the scan itself, and has no skew (keys are per-document).
@query(
    "text_repetition",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    b AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 1),
                                     i -> w[i] || ' ' || w[i + 1])) AS bg
        FROM t WHERE len(w) >= 2
    ),
    per AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           1.0 - count(*) / sum(c) AS dup_bigram_frac,
           max(c) / sum(c) AS top_bigram_frac
    FROM per GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", X.tokens_expr().alias("w")).filter(F.size("w") >= 2)
    bigrams = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("w", i), F.element_at("w", i + 1)
                ),
            )
        ).alias("bg"),
    )
    per = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            (F.lit(1.0) - F.count("*") / F.sum("c")).alias("dup_bigram_frac"),
            (F.max("c") / F.sum("c")).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


# Deterministic stratified sampling: per-stratum keep-rates applied as a
# pure narrow FILTER — md5(event_id) -> uniform bucket in [0,1000), kept
# iff below the stratum's rate.  No shuffle, no RNG, reproducible across
# engines and cluster sizes (the property that matters for training-data
# lineage: re-running the pipeline yields byte-identical samples).  The
# verification agg (per-type sampled count + Horvitz-Thompson estimate of
# the true total) is |event_types| groups.  At 100 TB: the sample IS the
# scan — rows drop at the source, and the filter is codegen'd.
@query(
    "q_stratified_sample",
    """
    WITH s AS (
        SELECT event_type,
               CASE event_type WHEN 'view' THEN 50 WHEN 'click' THEN 100
                    ELSE 1000 END AS rate,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
                   % 1000 AS bucket
        FROM events
    )
    SELECT event_type,
           count(*) AS n_sampled,
           count(*) * 1000.0 / rate AS est_total
    FROM s WHERE bucket < rate
    GROUP BY event_type, rate
    ORDER BY event_type
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "view", 50)
        .when(F.col("event_type") == "click", 100)
        .otherwise(1000)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    return (
        events.select("event_type", rate.alias("rate"), bucket.alias("bucket"))
        .filter(F.col("bucket") < F.col("rate"))
        .groupBy("event_type", "rate")
        .agg(F.count("*").alias("n_sampled"))
        .select(
            "event_type",
            "n_sampled",
            (F.col("n_sampled") * 1000.0 / F.col("rate")).alias("est_total"),
        )
        .orderBy("event_type")
    )


# TF-IDF keyword extraction: top-3 terms per document by smoothed TF-IDF
# (idf = ln((N+1)/(df+1)) + 1, scikit-learn's smoothing).  The canonical
# two-aggregate corpus statistic: tf shuffles on (doc, term) — bounded by
# total token count, same order as the scan; document frequency and the
# re-join shuffle on term; the rank window partitions on doc_id.  The
# scalar N broadcasts.  Ranking uses the UNROUNDED score (rounded only in
# the output): ln() may differ between engines in the last ulp, but an
# order flip would need two distinct (tf, df) combinations within 2 ulp
# of each other; exact ties (same tf, same df) are identical doubles on
# both engines and fall to the term tiebreaker.
@query(
    "text_tfidf_top_terms",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS rnk
        FROM scored
    )
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(X.tokens_expr()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("doc_id", "rnk")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (GPT-3 appendix-C style: drop any training
# document sharing a 13-gram with the held-out evaluation set).  The
# benchmark here is the deterministic doc_id % 10 == 0 slice — in
# production it is the actual eval suites, which are tiny (MBs) next to
# the 100 TB training corpus.  That asymmetry is the whole plan: the
# benchmark's distinct 13-grams BROADCAST, the training side streams
# through a broadcast hash join with no shuffle of the big side; only the
# contaminated survivors (rare) reach the final aggregate.  13 is the
# published n (Brown et al. 2020); shingling goes through the two-step
# bound-tokens form (operators/dedup.shingles_from_tokens) so long
# documents stay O(tokens).
# ---------------------------------------------------------------------------
_DECON_N = 13
_SQL_13G = (
    "CASE WHEN len(w) >= 13 THEN "
    "list_distinct(list_transform(generate_series(1, len(w)-12), "
    "i -> array_to_string(w[i:i+12], ' '))) "
    "ELSE []::VARCHAR[] END"
)


def decontaminate_hits_frame(docs: DataFrame, n: int = _DECON_N) -> DataFrame:
    """Reusable core of the decontamination report (also driven at 64×
    replication by tools/scale_stress_training_prep.py): training docs
    sharing ≥1 n-gram with the ``doc_id % 10 == 0`` benchmark slice, with
    the shared-distinct-gram count.  Shingles are per-doc distinct, so
    count(*) after the join IS the distinct-gram hit count — no
    countDistinct shuffle needed."""
    toks = docs.select("doc_id", X.tokens_expr().alias("w"))
    grams = toks.select(
        "doc_id",
        F.explode(D.shingles_from_tokens(F.col("w"), n)).alias("ng"),
    )
    bench = grams.filter(F.col("doc_id") % 10 == 0).select("ng").distinct()
    train = grams.filter(F.col("doc_id") % 10 != 0)
    return (
        train.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


@query(
    "pipeline_decontaminate_hits",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_SQL_13G}) AS ng FROM d),
    bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM g JOIN bench USING (ng)
    WHERE doc_id % 10 <> 0
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def pipeline_decontaminate_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decontaminate_hits_frame(docs).orderBy("doc_id")


@query(
    "pipeline_decontaminate_summary",
    f"""
    WITH d AS (SELECT doc_id, source, {SQL_TOKS} AS w FROM documents),
    g AS (SELECT doc_id, unnest({_SQL_13G}) AS ng FROM d),
    bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0),
    bad AS (SELECT DISTINCT doc_id FROM g JOIN bench USING (ng)
            WHERE doc_id % 10 <> 0)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM bad))
                AS BIGINT) AS n_dropped,
           CAST(count(*) FILTER (WHERE doc_id NOT IN (SELECT doc_id FROM bad))
                AS BIGINT) AS n_kept
    FROM d
    WHERE doc_id % 10 <> 0
    GROUP BY source
    ORDER BY source
    """,
    rotation=False,
)
def pipeline_decontaminate_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end decontamination: contaminated ids → left-anti keep →
    per-source kept/dropped accounting.  The anti-join's right side is
    the (rare) contaminated-id set — broadcast, so the corpus pass stays
    shuffle-free; the per-source rollup is one small hash aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", X.tokens_expr().alias("w"))
    grams = toks.select(
        "doc_id",
        F.explode(D.shingles_from_tokens(F.col("w"), _DECON_N)).alias("ng"),
    )
    bench = grams.filter(F.col("doc_id") % 10 == 0).select("ng").distinct()
    bad = (
        grams.filter(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(bench), "ng")
        .select("doc_id")
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "source")
    flagged = train.join(
        F.broadcast(bad.withColumn("is_bad", F.lit(1))), "doc_id", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_train"),
            F.sum(F.when(F.col("is_bad").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.sum(F.when(F.col("is_bad").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled domain mixing (the mT5 / Pile recipe: sample source s
# proportionally to p_s^α, α < 1 up-weighting rare domains), realized as
# pure DOWN-sampling so no row is ever duplicated: with α = 0.5 the keep
# rate for source s is (mass_min / mass_s)^(1-α) = sqrt(mass_min/mass_s)
# — the rarest source keeps 100%.  Every number the filter depends on is
# either an exact integer (token masses) or a single correctly-rounded
# IEEE op chain (one divide, one sqrt — no accumulation-order-dependent
# sums), so Spark and the oracle compute bit-identical rates; the rate is
# then fixed to integer ppm before the per-doc md5-bucket filter, the
# same zero-shuffle keep-rate pattern as q_stratified_sample.  Shape: one
# small per-source aggregate, min() broadcast back, narrow filter —
# nothing big ever shuffles.
# ---------------------------------------------------------------------------
@query(
    "q_temperature_mixing",
    """
    WITH m AS (
        SELECT source, count(*) AS n_docs,
               sum(len(list_filter(regexp_split_to_array(lower(text),
                   '[^a-z0-9]+'), x -> x <> ''))) AS mass
        FROM documents GROUP BY source
    ),
    r AS (
        SELECT source, n_docs, mass,
               CAST(round(1000000 * sqrt(
                   CAST((SELECT min(mass) FROM m) AS DOUBLE) / mass), 0)
                   AS BIGINT) AS rate_ppm
        FROM m
    )
    SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs,
           CAST(r.mass AS BIGINT) AS n_tokens, r.rate_ppm,
           CAST(count(*) FILTER (WHERE
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 1000000 < r.rate_ppm) AS BIGINT) AS n_kept
    FROM documents d JOIN r ON d.source = r.source
    GROUP BY r.source, r.n_docs, r.mass, r.rate_ppm
    ORDER BY r.source
    """,
)
def q_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(X.token_count_expr()).alias("mass"),
    )
    mmin = m.agg(F.min("mass").alias("mass_min"))
    rates = m.crossJoin(F.broadcast(mmin)).select(
        "source",
        "n_docs",
        "mass",
        F.round(
            1e6 * F.sqrt(F.col("mass_min").cast("double") / F.col("mass")), 0
        )
        .cast("long")
        .alias("rate_ppm"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000000
    )
    kept = docs.select("source", "doc_id").join(F.broadcast(rates), "source")
    return (
        kept.groupBy("source", "n_docs", "mass", "rate_ppm")
        .agg(
            F.sum(F.when(bucket < F.col("rate_ppm"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept")
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("mass").cast("long").alias("n_tokens"),
            "rate_ppm",
            "n_kept",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Sequence packing (training prep: concatenate the token stream in doc_id
# order and cut fixed 512-token sequences; a document starts at global
# token offset s_i = Σ tokens of all earlier docs).  The global running
# sum is the textbook DISTRIBUTED PREFIX SUM, not one giant window: a
# single `ORDER BY doc_id` window would funnel 100 TB through ONE
# partition.  Instead: (1) block = doc_id ÷ 64 — an intra-block window
# cumsum runs per block in parallel; (2) per-block totals (thousands of
# rows at any scale) get their own exclusive cumsum on one tiny
# partition; (3) block offsets broadcast back and add.  The oracle IS the
# one-window form — the differential proves the two-level decomposition
# exact, which is the point.
# ---------------------------------------------------------------------------
_PACK_BUDGET = 512


def pack_sequences_frame(
    docs: DataFrame,
    budget: int = _PACK_BUDGET,
    block: int = 64,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Reusable core of the packer (also driven at 64× replication by
    tools/scale_stress_training_prep.py, which verifies the two-level
    decomposition against a single global window at every scale).
    ``keep_cols`` pass through untouched (e.g. ``("source",)`` for the
    composed corpus pipeline)."""
    t = docs.select(
        "doc_id",
        *keep_cols,
        X.bpe_token_count_expr().cast("long").alias("n_tokens"),
    ).withColumn("blk", F.floor(F.col("doc_id") / block))
    w_intra = (
        Window.partitionBy("blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "intra", F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0))
    )
    blk_tot = t.groupBy("blk").agg(F.sum("n_tokens").alias("blk_sum"))
    w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    blk_off = blk_tot.select(
        "blk", F.coalesce(F.sum("blk_sum").over(w_blk), F.lit(0)).alias("off")
    )
    packed = t.join(F.broadcast(blk_off), "blk").withColumn(
        "s", F.col("off") + F.col("intra")
    )
    b = F.lit(budget)
    return packed.select(
        "doc_id",
        *keep_cols,
        "n_tokens",
        F.floor(F.col("s") / b).alias("seq_id"),
        (F.col("s") % b).alias("seq_offset"),
        (
            F.floor((F.col("s") + F.col("n_tokens") - 1) / b)
            - F.floor(F.col("s") / b)
            + 1
        ).alias("n_seqs_spanned"),
    )


@query(
    "pipeline_pack_sequences",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{X.BPE_RE}'))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS s
        FROM t
    )
    SELECT doc_id, n_tokens,
           s // {_PACK_BUDGET} AS seq_id,
           s % {_PACK_BUDGET} AS seq_offset,
           ((s + n_tokens - 1) // {_PACK_BUDGET}) - (s // {_PACK_BUDGET}) + 1
               AS n_seqs_spanned
    FROM c
    ORDER BY doc_id
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences_frame(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle + sharding (training prep: break source/
# crawl-order correlation before the epoch reader consumes shard files in
# parallel).  Engine-seeded shuffles (df.sample / rand()) are not
# reproducible across engines or cluster sizes, so the permutation key is
# md5(doc_id): shard = key % 16, position = rank of the key within the
# shard.  Per-shard windows hash-partition on shard — 16-way (or
# 10k-way) parallel, never a global sort; a reader streaming shard files
# in (shard, pos) order sees the md5 permutation.  doc_id is the window
# tie-break: md5 collisions on the 8-hex prefix are possible, full-key
# ties are not, so output is total-ordered on both engines.
# ---------------------------------------------------------------------------
def _bpe_cte_list(k: int) -> list[str]:
    """The k-iteration BPE dataflow as chained CTEs: w0 = word-frequency
    table with char-split symbol strings, then per iteration the argmax
    pair (p{i}) and the merged vocabulary (w{i+1}) — the same unrolled
    dataflow the Spark side builds, in SQL.  Shared by the learner and
    encoder oracles."""
    ctes = [
        f"""w0 AS (
        SELECT word, count(*) AS weight,
               ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
               || ' ' AS sym
        FROM (SELECT unnest({SQL_TOKS}) AS word FROM documents)
        GROUP BY word
    )"""
    ]
    for i in range(k):
        ctes.append(
            f"""p{i} AS (
        SELECT CAST({i} AS BIGINT) AS it, pa,
               CAST(sum(weight) AS BIGINT) AS freq
        FROM (SELECT weight,
                     unnest(CASE WHEN len(s) >= 2 THEN
                         list_transform(generate_series(1, len(s)-1),
                                        j -> s[j] || ' ' || s[j+1])
                         ELSE []::VARCHAR[] END) AS pa
              FROM (SELECT weight,
                           list_filter(string_split(sym, ' '), x -> x <> '')
                               AS s
                    FROM w{i}))
        GROUP BY pa ORDER BY freq DESC, pa LIMIT 1
    )"""
        )
        ctes.append(
            f"""w{i + 1} AS (
        SELECT word, weight,
               replace(replace(sym,
                   ' ' || b.pa || ' ', ' ' || replace(b.pa, ' ', '') || ' '),
                   ' ' || b.pa || ' ', ' ' || replace(b.pa, ' ', '') || ' ')
                   AS sym
        FROM w{i} CROSS JOIN p{i} b
    )"""
        )
    return ctes


def _bpe_oracle_sql(k: int) -> str:
    union = " UNION ALL ".join(
        f"SELECT it, pa AS pair, freq FROM p{i}" for i in range(k)
    )
    return (
        "WITH " + ",\n".join(_bpe_cte_list(k)) + "\n" + union + " ORDER BY it"
    )


def _bpe_encode_oracle_sql(k: int) -> str:
    """Encoder oracle: run the same learned chain, then tokenize every
    word occurrence with the final symbol table and aggregate per doc."""
    ctes = _bpe_cte_list(k)
    ctes.append(
        f"""enc AS (
        SELECT word,
               len(list_filter(string_split(sym, ' '), x -> x <> ''))
                   AS n_toks
        FROM w{k}
    )"""
    )
    ctes.append(
        f"""d AS (
        SELECT doc_id, unnest({SQL_TOKS}) AS word FROM documents
    )"""
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        """SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens,
               CAST(sum(len(word)) AS BIGINT) AS n_chars
        FROM d JOIN enc USING (word)
        GROUP BY doc_id ORDER BY doc_id"""
    )


def _bpe_vocab_oracle_sql(k: int, top: int) -> str:
    """Token-frequency oracle: the corpus-weighted frequency of every
    post-merge subword token, top-N."""
    ctes = _bpe_cte_list(k)
    ctes.append(
        f"""enc AS (
        SELECT weight,
               unnest(list_filter(string_split(sym, ' '), x -> x <> ''))
                   AS tok
        FROM w{k}
    )"""
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"""SELECT tok, CAST(sum(weight) AS BIGINT) AS freq
        FROM enc GROUP BY tok
        ORDER BY freq DESC, tok LIMIT {top}"""
    )


_BPE_MERGES = 6


# ---------------------------------------------------------------------------
# Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
# first k merge rules from the corpus.  The 100 TB shape: ONE corpus
# pass builds the word-frequency table (the only big shuffle); every
# merge iteration after that runs on the VOCABULARY — distinct words,
# which grow sublinearly (Heaps' law) and fit in memory at any corpus
# scale — so k iterations cost k tiny vocab passes, not k corpus scans
# (the vocab frame is register_cache'd to pin that).  Each iteration:
# weighted adjacent-pair count → global argmax (freq DESC, pair ASC —
# total order both engines) → merge via a 1-row broadcast and two
# left-to-right replace passes.  One replace pass IS the standard
# non-overlapping merge; the second pass settles odd repeated-symbol
# runs ('a a a a') the first pass's consumed-match scan skips — applied
# identically on both engines, so the differential pins the exact
# procedure.  Symbols are [a-z0-9] chars, the ' ' separator sorts below
# all of them, so ordering the 'a b' pair STRING equals ordering the
# (a, b) tuple.
# ---------------------------------------------------------------------------
#: Partitioning of the cached vocabulary for the merge iterations.  The
#: iterations process VOCAB-sized data, so their parallelism should match
#: the vocab, not inherit the corpus's shuffle width: at sf0.1 the
#: corpus-width default (32 shuffle partitions × 6 iterations of
#: near-empty tasks) measured 7.5 s vs 4.3 s with the vocab on one
#: partition.  At 100 TB a Heaps'-law vocab is GBs — size this to
#: vocab_bytes / 128 MB (tens of partitions), still decoupled from the
#: corpus's tens of thousands.
_BPE_VOCAB_PARTITIONS = 1


def _bpe_symbol_chain(docs: DataFrame, k: int):
    """Shared BPE dataflow: word-frequency vocab (ONE corpus pass,
    cached), char-split symbol strings, then k iterations of
    argmax-pair → broadcast → double-replace merge.  Returns
    ``(merges, syms)``: the per-iteration 1-row argmax frames and the
    final vocabulary with merges applied — the learner returns the
    former (:func:`pipeline_bpe_merges`), the encoder consumes the
    latter (:func:`pipeline_bpe_encode`)."""
    words = register_cache(
        docs.select(F.explode(X.tokens_expr()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
        .repartition(_BPE_VOCAB_PARTITIONS)
    )
    syms = words.withColumn(
        "sym",
        F.concat(
            F.lit(" "),
            F.array_join(F.regexp_extract_all("word", F.lit("."), 0), " "),
            F.lit(" "),
        ),
    )
    # r11: the argmax of each iteration is COLLECTED (one 1-row driver
    # scalar per round — the same bounded-collect class as the logreg GD
    # and k-means loops) and applied as a LITERAL double-replace, instead
    # of staying a lazy limit(1) subquery crossJoined into the chain.
    # The lazy form re-executed the whole prefix chain per returned
    # frame — profiled at 124-132 Spark jobs for the three BPE queries;
    # eager argmax is k jobs over the cached vocab, and the downstream
    # encode/vocab consumers see k literal replaces instead of k
    # broadcast-join subtrees.  Values are identical by construction:
    # the argmax is computed by the same aggregation either way.
    spark = docs.sparkSession
    merges = []
    for i in range(k):
        s = F.filter(F.split(F.col("sym"), " "), lambda x: x != "")
        pair_arr = F.when(
            F.size(s) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(s) - 1),
                lambda j: F.concat(
                    F.element_at(s, j), F.lit(" "), F.element_at(s, j + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pairs = syms.select("weight", F.explode(pair_arr).alias("pa"))
        top = (
            pairs.groupBy("pa")
            .agg(F.sum("weight").alias("freq"))
            .orderBy(F.desc("freq"), "pa")
            .limit(1)
            .collect()
        )
        if not top:
            # degenerate corpus (no adjacent pairs anywhere): the lazy
            # form's crossJoin-with-empty made syms empty from here on
            merges.append(
                spark.createDataFrame([], "it long, pair string, freq long")
            )
            syms = syms.where(F.lit(False))
            continue
        pa, freq = top[0]["pa"], top[0]["freq"]
        merges.append(
            spark.createDataFrame(
                [(i, pa, int(freq))], "it long, pair string, freq long"
            )
        )
        pat = F.lit(" " + pa + " ")
        rep = F.lit(" " + pa.replace(" ", "") + " ")
        syms = syms.withColumn(
            "sym", F.replace(F.replace(F.col("sym"), pat, rep), pat, rep)
        )
    return merges, syms


@query("pipeline_bpe_merges", _bpe_oracle_sql(_BPE_MERGES))
def pipeline_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges, _syms = _bpe_symbol_chain(docs, _BPE_MERGES)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("it")


_BPE_VOCAB_TOP = 50


@query("pipeline_bpe_encode", _bpe_encode_oracle_sql(_BPE_MERGES))
def pipeline_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges — the learn→apply tokenizer loop closed.

    Encoding never touches document text per-token: the merges are
    applied to the VOCABULARY (k tiny passes, Heaps'-law sized), and the
    corpus is tokenized by one join on ``word`` — per-word token counts
    fan back to every occurrence.  At 100 TB that is one shuffle of
    (doc_id, word) pairs against a broadcast-or-bucketed vocab, not a
    per-token Python loop.  Real token counts per doc (vs the regex
    approximation ``bpe_token_count_expr``) are the budget currency for
    packing/mixing."""
    docs = load_table(spark, sf_dir, "documents")
    _merges, syms = _bpe_symbol_chain(docs, _BPE_MERGES)
    enc = syms.select(
        "word",
        F.size(
            F.filter(F.split(F.col("sym"), " "), lambda x: x != "")
        ).cast("long").alias("n_toks"),
    )
    words = docs.select(
        "doc_id", F.explode(X.tokens_expr()).alias("word")
    )
    return (
        words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_toks").alias("n_bpe_tokens"),
            F.sum(F.length("word")).alias("n_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "pipeline_bpe_vocab",
    _bpe_vocab_oracle_sql(_BPE_MERGES, _BPE_VOCAB_TOP),
    rotation=False,
)
def pipeline_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-weighted subword frequency table after the learned merges
    — the artifact a tokenizer ships.  Vocab-sized end to end: explode
    the symbol strings of distinct words, weight by word frequency, one
    aggregate, top-N via TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    _merges, syms = _bpe_symbol_chain(docs, _BPE_MERGES)
    toks = syms.select(
        "weight",
        F.explode(
            F.filter(F.split(F.col("sym"), " "), lambda x: x != "")
        ).alias("tok"),
    )
    return (
        toks.groupBy("tok")
        .agg(F.sum("weight").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(_BPE_VOCAB_TOP)
    )


@query(
    "pipeline_shuffle_shards",
    """
    WITH keyed AS (
        SELECT doc_id, source,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) AS k
        FROM documents
    )
    SELECT doc_id, source,
           k % 16 AS shard,
           CAST(row_number() OVER (PARTITION BY k % 16 ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM keyed
    ORDER BY shard, pos
    """,
)
def pipeline_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("k")
    )
    keyed = docs.select("doc_id", "source", k).withColumn(
        "shard", F.col("k") % 16
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "source", "shard", "pos")
        .orderBy("shard", "pos")
    )


# ---------------------------------------------------------------------------
# The COMPOSED training-corpus pipeline — what a user of this engine
# actually runs before a pretraining job, as ONE lazy plan: quality gate
# (≥ 20 word tokens, narrow filter) → 13-gram benchmark decontamination
# (broadcast gram join → broadcast anti-join) → temperature-scaled
# domain mixing over the CLEAN corpus's masses (tiny aggregate +
# broadcast integer-ppm rates, narrow keep filter) → sequence packing
# (two-level distributed prefix sum).  Every stage is the scale shape
# proven individually above; composing them adds no new shuffle of the
# corpus — the only wide operations are the gram distinct (benchmark,
# tiny), the per-source mass aggregate (tiny), and the per-block
# packing windows.  The oracle replays the identical chain in SQL, so
# the differential pins stage ORDER too (mixing rates depend on
# post-decontamination masses; packing offsets depend on the mixed
# survivor set).
# ---------------------------------------------------------------------------
@query(
    "pipeline_training_corpus",
    f"""
    WITH t AS (
        SELECT doc_id, source, text, {SQL_TOKS} AS w FROM documents
    ),
    g AS (SELECT doc_id, unnest({_SQL_13G}) AS ng FROM t),
    bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0),
    bad AS (SELECT DISTINCT doc_id FROM g JOIN bench USING (ng)
            WHERE doc_id % 10 <> 0),
    clean AS (
        SELECT doc_id, source, text, len(w) AS n_words FROM t
        WHERE len(w) >= 20 AND doc_id % 10 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM bad)
    ),
    m AS (SELECT source, sum(n_words) AS mass FROM clean GROUP BY source),
    r AS (
        SELECT source,
               CAST(round(1000000 * sqrt(
                   CAST((SELECT min(mass) FROM m) AS DOUBLE) / mass), 0)
                   AS BIGINT) AS rate_ppm
        FROM m
    ),
    mixed AS (
        SELECT c.doc_id, c.source, c.text
        FROM clean c JOIN r ON c.source = r.source
        WHERE CAST('0x' || substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 1000000 < r.rate_ppm
    ),
    p AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '{X.BPE_RE}'))
                    AS BIGINT) AS n_tokens
        FROM mixed
    ),
    c2 AS (
        SELECT doc_id, source, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS s
        FROM p
    )
    SELECT doc_id, source, n_tokens,
           s // {_PACK_BUDGET} AS seq_id,
           s % {_PACK_BUDGET} AS seq_offset,
           ((s + n_tokens - 1) // {_PACK_BUDGET}) - (s // {_PACK_BUDGET}) + 1
               AS n_seqs_spanned
    FROM c2
    ORDER BY doc_id
    """,
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return training_corpus_frame(docs).orderBy("doc_id")


def training_corpus_frame(docs: DataFrame, observations: dict | None = None) -> DataFrame:
    """The composed chain (see the query's comment block).  When
    ``observations`` is a dict, per-stage row counts attach as Spark
    ``Observation`` metrics — accumulator-backed, collected DURING the
    one job, zero extra passes (vs. a naive ``count()`` per stage = four
    extra corpus scans); the dict fills with name → Observation, values
    readable after any action.  Observations attach only to
    SINGLE-consumer nodes: an observed node feeding two plan branches
    (e.g. ``clean``, consumed by both the mass aggregate and the mix
    filter) would have its accumulator incremented by both evaluations
    and double-count."""
    from pyspark.sql import Observation

    def obs(df: DataFrame, name: str) -> DataFrame:
        if observations is None:
            return df
        o = Observation(name)
        observations[name] = o
        return df.observe(o, F.count(F.lit(1)).alias("rows"))

    t = docs.select("doc_id", "source", "text", X.tokens_expr().alias("w"))
    grams = t.select(
        "doc_id",
        F.explode(D.shingles_from_tokens(F.col("w"), _DECON_N)).alias("ng"),
    )
    bench = grams.filter(F.col("doc_id") % 10 == 0).select("ng").distinct()
    bad = (
        grams.filter(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(bench), "ng")
        .select("doc_id")
        .distinct()
    )
    clean = (
        obs(t.filter((F.size("w") >= 20) & (F.col("doc_id") % 10 != 0)), "quality_pass")
        .join(F.broadcast(obs(bad, "contaminated")), "doc_id", "left_anti")
        .select("doc_id", "source", "text", F.size("w").alias("n_words"))
    )
    if observations is not None:
        # clean feeds BOTH the mass aggregate and the mix filter; without
        # a cache the whole observed subtree evaluates once per branch
        # and quality_pass/contaminated double-count.  The cache pins one
        # evaluation (and is the better plan for dual consumption anyway;
        # caller releases via caching.release_caches()).
        clean = register_cache(clean)
    m = clean.groupBy("source").agg(F.sum("n_words").alias("mass"))
    mmin = m.agg(F.min("mass").alias("mass_min"))
    rates = m.crossJoin(F.broadcast(mmin)).select(
        "source",
        F.round(
            1e6 * F.sqrt(F.col("mass_min").cast("double") / F.col("mass")), 0
        )
        .cast("long")
        .alias("rate_ppm"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000000
    )
    mixed = obs(
        clean.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate_ppm"))
        .select("doc_id", "source", "text"),
        "mixed_keep",
    )
    return pack_sequences_frame(mixed, keep_cols=("source",))


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (dimensionality reduction for
# embedding pipelines: 64 → 8 dims with pairwise distances preserved in
# expectation).  Projection matrix = md5-derived ±1 signs (Achlioptas
# 2003: Rademacher entries satisfy the JL lemma — no Gaussian RNG
# needed), inlined as literals.  Arithmetic is EXACT, not approximately
# reproducible: components quantize to round(v·10⁶) (a float32 × 10⁶
# product is exact in double — 24+20 mantissa bits < 53 — and can never
# land on .5, so the rounding is engine-independent), and ±1 dot
# products of integer-valued doubles stay below 2⁵³, so every sum is
# exact regardless of accumulation order — no rounding rule needed.
# Narrow transform, zero shuffle; at 100 TB this is the map stage that
# feeds 8-dim vectors to downstream clustering at 1/8 the bytes.
# ---------------------------------------------------------------------------
_JL_OUT_DIMS = 8


def _jl_signs(j: int, dim: int) -> list[int]:
    import hashlib

    return [
        1 if int(hashlib.md5(f"jl:{j}:{d}".encode()).hexdigest()[:8], 16) % 2 == 0
        else -1
        for d in range(dim)
    ]


def _sql_jl_proj(j: int) -> str:
    arr = "[" + ", ".join(str(s) for s in _jl_signs(j, EMB_DIM)) + "]::DOUBLE[]"
    return (
        "CAST(list_dot_product(list_transform(embedding::DOUBLE[], "
        f"x -> round(x * 1000000, 0)), {arr}) AS BIGINT) AS p{j}"
    )


@query(
    "sim_jl_projection",
    f"""
    SELECT vec_id, {", ".join(_sql_jl_proj(j) for j in range(_JL_OUT_DIMS))}
    FROM embeddings
    ORDER BY vec_id
    """,
)
def sim_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 1e6, 0)
    )
    emb = emb.select("vec_id", q.alias("q"))
    cols = []
    for j in range(_JL_OUT_DIMS):
        signs = F.array(
            *[F.lit(float(s)) for s in _jl_signs(j, EMB_DIM)]
        )
        prod = F.zip_with(F.col("q"), signs, lambda a, b: a * b)
        cols.append(
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
            .cast("long")
            .alias(f"p{j}")
        )
    return emb.select("vec_id", *cols).orderBy("vec_id")


# ---------------------------------------------------------------------------
# FUZZY benchmark decontamination: exact 13-gram overlap
# (pipeline_decontaminate_hits) misses paraphrased/lightly-edited eval
# leakage; this catches training docs that LSH-NEAR-DUP a benchmark doc
# (jaccard ≥ 0.5 on 3-gram shingles).  Registered form reuses the
# verified-pairs self-join and keeps only cross-set pairs — exact oracle
# parity with the dedup stack.  At 100 TB run the ASYMMETRIC shape
# instead: `build_minhash_index(benchmark)` + `dedup_against_index(train)`
# (both shipped and tested) band-joins the corpus against a tiny
# benchmark index without ever generating train×train candidates.
# ---------------------------------------------------------------------------
@query(
    "pipeline_decontaminate_fuzzy",
    f"""
    WITH {_SQL_SHINGLE_CTE},
    sig AS (SELECT doc_id, {_SQL_MINHASH_AGGS} FROM ex GROUP BY doc_id),
    bands AS ({_SQL_BANDS}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    ),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared, min(a.n) AS na, min(b.n) AS nb
        FROM ex a
        JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        WHERE (a.doc_id, b.doc_id) IN (SELECT (doc_a, doc_b) FROM cand)
        GROUP BY 1, 2
    ),
    verified AS (
        SELECT doc_a, doc_b, round(shared / (na + nb - shared), 6) AS jaccard
        FROM shared
        WHERE round(shared / (na + nb - shared), 6) >= 0.5
    )
    SELECT CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS doc_id,
           round(max(jaccard), 6) AS max_jaccard,
           CAST(count(*) AS BIGINT) AS n_bench_matches
    FROM verified
    WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)
    GROUP BY 1
    ORDER BY doc_id
    """,
)
def pipeline_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.lsh_verified_pairs(docs)
    a_bench = F.col("doc_a") % 10 == 0
    b_bench = F.col("doc_b") % 10 == 0
    cross = pairs.filter(a_bench != b_bench)
    train_doc = F.when(a_bench, F.col("doc_b")).otherwise(F.col("doc_a"))
    return (
        cross.groupBy(train_doc.alias("doc_id"))
        .agg(
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
            F.count("*").cast("long").alias("n_bench_matches"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Time-series gap filling with forward fill (the TimescaleDB
# time_bucket_gapfill + locf shape): a dense hourly spine over the data's
# span, zero-filled counts, and last-observation-carried-forward for the
# hourly mean.  The LOCF is the same two-level decomposition as
# pipeline_pack_sequences — a naive global `last_value IGNORE NULLS`
# window funnels the whole series through ONE partition; instead the
# fill runs per-day in parallel and a tiny per-day carry table
# (≤ #days rows, its own single-partition window is nothing) broadcasts
# the previous days' last value across day boundaries.  The oracle IS
# the naive single-window form, so the differential proves the
# decomposition exact — boundary hours included.
# ---------------------------------------------------------------------------
@query(
    "q_gap_fill_hourly",
    """
    WITH h AS (
        SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY 1
    ),
    spine AS (
        SELECT unnest(generate_series((SELECT min(hour) FROM h),
                                      (SELECT max(hour) FROM h),
                                      INTERVAL 1 HOUR)) AS hour
    ),
    joined AS (
        SELECT s.hour, COALESCE(h.n_events, 0) AS n_events, h.avg_value
        FROM spine s LEFT JOIN h ON s.hour = h.hour
    )
    SELECT hour, CAST(n_events AS BIGINT) AS n_events,
           last_value(avg_value IGNORE NULLS) OVER (
               ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_avg
    FROM joined
    ORDER BY hour
    """,
)
def q_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    h = events.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    bounds = h.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    joined = spine.join(h, "hour", "left").select(
        "hour",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "avg_value",
        F.date_trunc("day", "hour").alias("day"),
    )
    w_intra = (
        Window.partitionBy("day")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = joined.withColumn(
        "intra_fill", F.last("avg_value", ignorenulls=True).over(w_intra)
    )
    # per-day last observed value (tiny: one row per day)
    day_last = (
        intra.groupBy("day")
        .agg(F.max_by("intra_fill", "hour").alias("day_last"))
    )
    w_days = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = day_last.select(
        "day",
        F.last("day_last", ignorenulls=True).over(w_days).alias("carry"),
    )
    return (
        intra.join(F.broadcast(carry), "day")
        .select(
            "hour",
            "n_events",
            F.coalesce("intra_fill", "carry").alias("filled_avg"),
        )
        .orderBy("hour")
    )


# Value-distribution histogram per group: fixed-width buckets as a pure
# projection (floor arithmetic — no UDF, no shuffle before the count),
# the building block of data-quality profiling at corpus scale.
@query(
    "q_histogram",
    """
    SELECT event_type,
           CAST(least(floor(value / 33.0), 9) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 33.0), F.lit(9)).cast("long")
    return (
        events.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# Funnel analysis (view → click → purchase): per user, a stage counts
# only if it happens strictly AFTER the previous stage's first
# occurrence — the product-analytics ordered-conversion query.  One hash
# aggregate per user computing three conditional minima (min ts of each
# stage), then pure comparisons; no self-joins, no window over the raw
# events.  At 100 TB: shuffles once on user_id, aggregate state is three
# timestamps per user.
# ---------------------------------------------------------------------------
@query(
    "q_funnel",
    """
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(count(t_view) AS BIGINT) AS n_view,
           CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
               AS n_view_click,
           CAST(count(CASE WHEN t_click > t_view AND t_purchase > t_click
                      THEN 1 END) AS BIGINT) AS n_view_click_purchase
    FROM per_user
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    t_click_ok = F.when(
        F.col("t_click") > F.col("t_view"), F.col("t_click")
    )
    staged = per_user.select(
        "t_view",
        t_click_ok.alias("t_click_ok"),
        "t_purchase",
    )
    return staged.agg(
        F.count("t_view").cast("long").alias("n_view"),
        F.count("t_click_ok").cast("long").alias("n_view_click"),
        F.count(
            F.when(F.col("t_purchase") > F.col("t_click_ok"), F.lit(1))
        )
        .cast("long")
        .alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
# Retention cohorts: users grouped by first-seen day; for each (cohort,
# day-offset) the count of distinct users active that many days later —
# the standard retention triangle.  Two aggregates (first-seen per user,
# then the cohort×offset distinct count) + one broadcast-able join on
# user_id's first day; offsets capped at 7 to keep the output a stable
# differential.
# ---------------------------------------------------------------------------
@query(
    "q_retention_cohorts",
    """
    WITH first_seen AS (
        SELECT user_id, min(date_trunc('day', ts)) AS cohort FROM events
        GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    WHERE date_diff('day', f.cohort, a.day) <= 7
    GROUP BY 1, 2
    ORDER BY cohort, day_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort")
    )
    activity = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    joined = activity.join(first_seen, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort").cast("long")
    )
    return (
        joined.filter(F.col("day_offset") <= 7)
        .groupBy("cohort", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
        .orderBy("cohort", "day_offset")
    )


# ---------------------------------------------------------------------------
# Exponentially-weighted moving activity (EWMA, decay ½ per hour, 24 h
# horizon) — EXACT, no float accumulation anywhere: over the gap-filled
# dense hourly series, ewma_scaled(t) = Σ_{k=0..23} n(t−k) · 2^(23−k),
# an integer (the real EWMA times 2^23).  A plain window sum cannot
# express pair-dependent weights, so the 24 decay terms are GENERATED as
# lag() expressions — all integer, order-free, bit-identical on both
# engines with no rounding rule.  Shape: the dense (type × hour) spine
# is one sequence-explode cross join; the lags partition by event_type —
# parallel across groups, 24-row state per partition stream.
# ---------------------------------------------------------------------------
_EWMA_H = 24


def _sql_ewma_terms() -> str:
    return " + ".join(
        f"lag(n, {k}, 0) OVER w * {2 ** (_EWMA_H - 1 - k)}"
        for k in range(_EWMA_H)
    )


@query(
    "q_ewma_hourly",
    f"""
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    spine AS (
        SELECT t.event_type, s.hour
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series((SELECT min(hour) FROM h),
                                          (SELECT max(hour) FROM h),
                                          INTERVAL 1 HOUR)) AS hour) s
    ),
    dense AS (
        SELECT s.event_type, s.hour, COALESCE(h.n, 0) AS n
        FROM spine s LEFT JOIN h
          ON s.event_type = h.event_type AND s.hour = h.hour
    )
    SELECT event_type, hour, CAST(n AS BIGINT) AS n,
           CAST({_sql_ewma_terms()} AS BIGINT) AS ewma_scaled
    FROM dense
    WINDOW w AS (PARTITION BY event_type ORDER BY hour)
    ORDER BY event_type, hour
    """,
)
def q_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    h = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    bounds = h.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    types = events.select("event_type").distinct()
    dense = (
        types.crossJoin(F.broadcast(hours))
        .join(h, ["event_type", "hour"], "left")
        .select(
            "event_type", "hour", F.coalesce("n", F.lit(0)).alias("n")
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    ewma = sum(
        F.lag("n", k, 0).over(w) * F.lit(2 ** (_EWMA_H - 1 - k))
        for k in range(_EWMA_H)
    )
    return dense.select(
        "event_type",
        "hour",
        F.col("n").cast("long").alias("n"),
        ewma.cast("long").alias("ewma_scaled"),
    ).orderBy("event_type", "hour")


# ---------------------------------------------------------------------------
# Hypertable rollups over irregular samples (the TimescaleDB
# time_weight / state_agg pair): events arrive at uneven intervals, so
# a plain avg() over-weights bursts.  Both operators integrate the
# last-observation-carried-forward (LOCF) step curve: each event holds
# until the user's next event; the final event closes the series (zero
# further weight — the reference semantic for a right-open series).
#
# Exactness scheme: durations are integer MICROSECONDS (unix_micros /
# epoch_us), values integerized to cents (round(value*100) — the 2-dp
# generator means the scaled double is never near a .5 boundary), so
# the integral Σ v_cents · Δt_us is ONE exact BIGINT sum per group on
# both engines; the time-weighted mean is a single IEEE division of two
# identically-computed exact integers — bit-identical, no rounding rule
# needed.  time_in_state is all-integer end to end.
#
# Shape: ONE shuffle each — the lead/lag window partitions by user_id,
# and the follow-up aggregate clusters on (user_id[, event_type]), which
# hash(user_id) already satisfies, so Catalyst plans NO second exchange.
# At 100 TB both are per-user-stream linear scans with tiny window state
# (one row of lookahead).
# ---------------------------------------------------------------------------
@query(
    "q_time_weighted_avg",
    """
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) AS t_us,
               CAST(round(value * 100) AS BIGINT) AS v_c,
               lead(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(nxt_us - t_us) AS BIGINT) AS span_us,
           CAST(sum(v_c * (nxt_us - t_us)) AS DOUBLE)
               / CAST(sum(nxt_us - t_us) * 100 AS DOUBLE) AS twa
    FROM e
    GROUP BY user_id
    HAVING sum(nxt_us - t_us) > 0
    ORDER BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average of ``value`` per user (TimescaleDB
    ``time_weight('LOCF', ts, value)``): Σ value·Δt / Σ Δt over the
    user's observed span, Δt in exact integer microseconds, values in
    exact integer cents — the divide is the only float op.  Users with
    a single event have no span and are excluded (HAVING span > 0)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    stepped = e.select(
        "user_id",
        t_us.alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
        F.lead(t_us).over(w).alias("nxt_us"),
    )
    dur = F.col("nxt_us") - F.col("t_us")
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dur).alias("span_us"),
            F.sum(F.col("v_c") * dur).alias("wv"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "n_events",
            "span_us",
            (
                F.col("wv").cast("double")
                / (F.col("span_us") * 100).cast("double")
            ).alias("twa"),
        )
        .orderBy("user_id")
    )


_HEARTBEAT_GAP_US = 15 * 60 * 1_000_000  # liveness threshold: 15 min


@query(
    "q_heartbeat_gaps",
    f"""
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) AS t_us,
               lead(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
        FROM events
    ),
    d AS (SELECT user_id, nxt_us - t_us AS dur_us FROM e
          WHERE nxt_us IS NOT NULL)
    SELECT user_id,
           CAST(count(*) + 1 AS BIGINT) AS n_events,
           CAST(sum(dur_us) AS BIGINT) AS span_us,
           CAST(sum(CASE WHEN dur_us > {_HEARTBEAT_GAP_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
           CAST(sum(CASE WHEN dur_us > {_HEARTBEAT_GAP_US}
                         THEN dur_us ELSE 0 END) AS BIGINT) AS down_us,
           CAST(sum(CASE WHEN dur_us > {_HEARTBEAT_GAP_US}
                         THEN 0 ELSE dur_us END) AS BIGINT) AS up_us,
           CAST(max(dur_us) AS BIGINT) AS max_gap_us
    FROM d
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_heartbeat_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat liveness rollup (TimescaleDB ``heartbeat_agg``): each
    event asserts the user was live until the next one; an inter-event
    interval over the 15-minute threshold is a GAP (downtime), under it
    uptime — per user: gap count, total down/up microseconds, worst
    gap.  All-integer (µs), no rounding anywhere.  Same one-exchange
    shape as the other LOCF rollups: the lead window partitions by
    user_id and the aggregate reuses that partitioning."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    d = (
        e.select(
            "user_id",
            t_us.alias("t_us"),
            F.lead(t_us).over(w).alias("nxt_us"),
        )
        .filter(F.col("nxt_us").isNotNull())
        .select("user_id", (F.col("nxt_us") - F.col("t_us")).alias("dur_us"))
    )
    is_gap = F.col("dur_us") > _HEARTBEAT_GAP_US
    return (
        d.groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_events"),
            F.sum("dur_us").alias("span_us"),
            F.sum(is_gap.cast("long")).alias("n_gaps"),
            F.sum(F.when(is_gap, F.col("dur_us")).otherwise(0)).alias(
                "down_us"
            ),
            F.sum(F.when(is_gap, F.lit(0)).otherwise(F.col("dur_us"))).alias(
                "up_us"
            ),
            F.max("dur_us").alias("max_gap_us"),
        )
        .orderBy("user_id")
    )


@query(
    "q_time_in_state",
    """
    WITH e AS (
        SELECT user_id, event_type,
               epoch_us(ts) AS t_us,
               lead(epoch_us(ts)) OVER w AS nxt_us,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN prev_type IS NULL
                          OR prev_type <> event_type
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_entries,
           CAST(coalesce(sum(nxt_us - t_us), 0) AS BIGINT) AS dur_us
    FROM e
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def q_time_in_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-in-state per (user, event_type) — TimescaleDB
    ``state_agg``: under LOCF each event's type is the user's state
    until their next event, so ``dur_us`` totals the exact integer
    microseconds spent in each state and ``n_entries`` counts run-length
    transitions INTO it (lag ≠ current).  All-integer, no rounding.
    Same one-exchange shape as q_time_weighted_avg: both windows share
    the user_id partitioning and the aggregate reuses it."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    stepped = e.select(
        "user_id",
        "event_type",
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("nxt_us"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    entered = (
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).cast("long")
    return (
        stepped.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(entered).alias("n_entries"),
            F.coalesce(
                F.sum(F.col("nxt_us") - F.col("t_us")), F.lit(0)
            ).alias("dur_us"),
        )
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Context-window chunking — the dual of pipeline_pack_sequences: split
# each document into CHUNK_SIZE-token windows every CHUNK_STRIDE tokens
# (overlap = size - stride) so no cross-boundary span is lost.  Map-only
# after the scan (tokenize -> sequence -> slice -> explode), no shuffle:
# at 100 TB this is the cheapest pass in the prep pipeline, output rows
# ~ n_tokens / stride.  The chunk count rule (1 + ceil((n - size) /
# stride), no fully-redundant tail chunk) is mirrored by the oracle's
# integer arithmetic exactly.
# ---------------------------------------------------------------------------
_CH_SQL_SLICE = (
    f"list_slice(toks, k * {X.CHUNK_STRIDE} + 1, "
    f"k * {X.CHUNK_STRIDE} + {X.CHUNK_SIZE})"
)


@query(
    "pipeline_chunk_documents",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    c AS (
        SELECT doc_id, toks, n,
               CASE WHEN n <= {X.CHUNK_SIZE} THEN 1
                    ELSE 1 + (n - {X.CHUNK_SIZE} + {X.CHUNK_STRIDE} - 1)
                             // {X.CHUNK_STRIDE}
               END AS nch
        FROM n
    ),
    x AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, nch - 1)) AS k
        FROM c
    )
    SELECT doc_id,
           k AS chunk_idx,
           k * {X.CHUNK_STRIDE} AS chunk_start,
           len({_CH_SQL_SLICE}) AS n_chunk_tokens,
           md5(array_to_string({_CH_SQL_SLICE}, ' ')) AS chunk_md5
    FROM x
    """,
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.chunk_documents(docs)


# ---------------------------------------------------------------------------
# IVF-SQ8: the IVF probe with int8-scalar-quantized candidate scoring —
# the 4x-memory-compression ANN tier (FAISS IVF-SQ construction).  The
# coarse quantizer (cell assignment + probe) is IDENTICAL to
# sim_knn_ivf_mp; only the candidate cosine runs on codes.  Quantized
# dot/norms are all-integer, so cross-engine results are exact (not just
# rounded-equal).  q_i = sign(x) * floor(abs(x) * 127.0 / maxabs + 0.5)
# is the same IEEE-double expression on both engines.
# ---------------------------------------------------------------------------
_SQL_SQ8_SIM = (
    "round(list_dot_product(qa, ca) / "
    "nullif(sqrt(list_dot_product(qa, qa)) * "
    "sqrt(list_dot_product(ca, ca)), 0.0), 6)"
)


@query(
    "sim_knn_ivf_sq8",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q8 AS (
        SELECT vec_id,
               list_transform(
                   v, x -> CASE WHEN ma = 0 THEN 0
                           ELSE CAST(floor(abs(x) * 127.0 / ma + 0.5)
                                     * sign(x) AS BIGINT) END
               )::DOUBLE[] AS q
        FROM (SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) AS ma
              FROM e) s
    ),
    cent AS (SELECT vec_id AS c_id, v AS cvv FROM e WHERE vec_id < {S.N_IVF_CELLS}),
    csims AS (
        SELECT e.vec_id, c.c_id,
               round(list_dot_product(e.v, c.cvv) /
                     nullif(sqrt(list_dot_product(e.v, e.v)) *
                            sqrt(list_dot_product(c.cvv, c.cvv)), 0.0), 6) AS csim
        FROM e CROSS JOIN cent c
    ),
    assign AS (
        SELECT vec_id, c_id AS cell FROM csims
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) = 1
    ),
    probe AS (
        SELECT vec_id AS query_id, c_id AS cell FROM csims
        WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) <= {S.IVF_PROBES}
    ),
    pairs AS (
        SELECT p.query_id, a.vec_id AS neighbor_id, qq.q AS qa, qc.q AS ca
        FROM probe p
        JOIN assign a ON a.cell = p.cell
        JOIN q8 qq ON qq.vec_id = p.query_id
        JOIN q8 qc ON qc.vec_id = a.vec_id
        WHERE p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, {_SQL_SQ8_SIM} AS sq8_sim
    FROM pairs
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY {_SQL_SQ8_SIM} DESC, neighbor_id) <= 10
    """,
    rotation=False,
)
def sim_knn_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_ivf_sq8(emb, KNN_QUERY_IDS, k=10)


# ---------------------------------------------------------------------------
# Time-RANGE window frame — the "rolling last hour" per-row aggregate,
# a frame class nothing else in the library exercises (rows-frames and
# tumbling/sliding buckets are covered; this is the value-range frame).
# The frame is defined on epoch SECONDS (integer) so both engines bound
# it identically — FLOORED on both sides: Spark's unix_timestamp
# truncates sub-second parts while DuckDB's epoch()::BIGINT would ROUND
# them (found by the sf0.01 differential; sf0.001 has whole-second ts).
# RANGE ... CURRENT ROW includes all peers of the current second on both
# engines, making ties order-independent.
# One shuffle on event_type, one sort per partition — at 100 TB this is
# the standard single-window shape (and the partition key keeps the
# global-sort WindowExec warning away).
# ---------------------------------------------------------------------------
@query(
    "q_time_range_window",
    """
    SELECT event_id, event_type,
           CAST(count(*) OVER w AS BIGINT) AS n_prev_hour,
           round(sum(value) OVER w, 6) AS sum_prev_hour
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select(
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).cast("long").alias("n_prev_hour"),
        F.round(F.sum("value").over(w), 6).alias("sum_prev_hour"),
    )


# ---------------------------------------------------------------------------
# Second-moment profiling aggregates: stddev/variance/correlation/
# covariance — the statistical-profiling class (data-quality drift
# checks over a training corpus run exactly these).  Both engines use
# single-pass co-moment updates whose accumulation order differs, so
# every statistic is rounded (4 dp: these are O(1)-magnitude or
# group-local quantities — user_id, not raw epoch, is the covariate
# precisely so the covariance magnitude stays round-stable).
# ---------------------------------------------------------------------------
@query(
    "q_numeric_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 4) AS mean_value,
           round(stddev_samp(value), 4) AS sd_value,
           round(var_samp(value), 4) AS var_value,
           round(corr(value, user_id::DOUBLE), 4) AS corr_value_user,
           round(covar_samp(value, user_id::DOUBLE), 4) AS covar_value_user
    FROM events
    GROUP BY event_type
    """,
)
def q_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(F.corr(F.col("value"), u), 4).alias("corr_value_user"),
        F.round(F.covar_samp(F.col("value"), u), 4).alias("covar_value_user"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — the general form cube/rollup specialize (both already
# covered); an arbitrary set list plans as ONE Expand + one partial+final
# aggregate pair, not one scan per set.  grouping_id disambiguates the
# NULLs that mark rolled-up columns: Spark's grouping_id() and DuckDB's
# GROUPING(a, b) emit the same bit vector for the same column order.
# dow is normalized to DuckDB's convention (Sunday = 0; Spark's
# dayofweek is Sunday = 1).
# ---------------------------------------------------------------------------
@query(
    "q_grouping_sets",
    """
    SELECT CAST(GROUPING(event_type, dow) AS BIGINT) AS gid,
           event_type, dow,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM (SELECT event_type, dayofweek(ts)::BIGINT AS dow, value FROM events)
    GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        "value",
    )
    return base.groupingSets(
        [["event_type", "dow"], ["event_type"], ["dow"]], "event_type", "dow"
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select("gid", "event_type", "dow", "n", "sum_value")


# ---------------------------------------------------------------------------
# Weighted sampling without replacement — training-data mixing's other
# half: pick k documents with probability ~ weight (here token count:
# longer docs more likely), deterministically.  Exponential-clock scheme:
# key_i = u_i / w_i with u_i an md5-derived uniform — the doc with the
# smallest clock wins (for selection fractions << 1 this matches
# Efraimidis-Spirakis exponential keys; integers + ONE double division
# keep both engines bit-identical, no ln/pow libm drift).  Zero-weight
# docs get +1 smoothing so empty docs remain sampleable.  One narrow
# projection + TakeOrderedAndProject — no shuffle before the top-k.
# ---------------------------------------------------------------------------
_WS_K = 50


@query(
    "q_weighted_sample",
    f"""
    WITH w AS (
        SELECT doc_id,
               len({SQL_TOKS}) + 1 AS weight,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 8)
                    AS BIGINT) AS u
        FROM documents
    )
    SELECT doc_id, CAST(weight AS BIGINT) AS weight,
           u / weight AS clock
    FROM w
    ORDER BY clock, doc_id
    LIMIT {_WS_K}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weight = (F.size(X.tokens_expr()) + 1).cast("long")
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (
        docs.select(
            "doc_id",
            weight.alias("weight"),
            (u.cast("double") / weight.cast("double")).alias("clock"),
        )
        .orderBy("clock", "doc_id")
        .limit(_WS_K)
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG / string_agg WITHIN GROUP) — the
# reporting-layer shape: per event type, the top-5 users as one ordered
# "user:count" string.  Spark side composes it deterministically from
# sort_array(collect_list(struct)) so the intra-group order is explicit
# data, not sink-side luck; the oracle's string_agg(... ORDER BY) mirrors
# the same (count DESC, user ASC) order via the struct's (-n, user) key.
# Top-5 per group first, so collect_list holds ≤5 elements per group —
# bounded, no giant-group risk.
# ---------------------------------------------------------------------------
@query(
    "q_listagg_top_users",
    """
    WITH c AS (
        SELECT event_type, user_id, count(*) AS n
        FROM events GROUP BY event_type, user_id
    ),
    top AS (
        SELECT * FROM c
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY n DESC, user_id) <= 5
    )
    SELECT event_type,
           string_agg(user_id || ':' || n, ',' ORDER BY n DESC, user_id)
               AS top_users
    FROM top
    GROUP BY event_type
    """,
)
def q_listagg_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    top = c.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= 5)
    item = F.struct((-F.col("n")).alias("negn"), F.col("user_id").alias("u"))
    return top.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(item)),
                lambda s: F.concat(
                    s["u"].cast("string"), F.lit(":"), (-s["negn"]).cast("string")
                ),
            ),
            ",",
        ).alias("top_users")
    )


# ---------------------------------------------------------------------------
# Heavy hitters: exact "count > n/100" words computed through per-
# partition Misra-Gries candidate pruning + exact verification (see
# operators/text.py).  The sketch bounds the vocabulary shuffle to
# ≤ capacity x partitions candidate words at ANY corpus size; the
# superset guarantee makes the result EXACT for any partitioning, so
# the oracle is the plain exact GROUP BY ... HAVING — the differential
# proves the pruning drops nothing.
# ---------------------------------------------------------------------------
_HH_T = 100


@query(
    "text_heavy_hitters",
    f"""
    WITH w AS (SELECT unnest({SQL_TOKS}) AS word FROM documents),
    t AS (SELECT count(*) AS total FROM w)
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM w CROSS JOIN t
    GROUP BY word, t.total
    HAVING count(*) * {_HH_T} > t.total
    ORDER BY n DESC, word
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.heavy_hitters(docs, threshold_frac=_HH_T)


# ---------------------------------------------------------------------------
# Rolling distinct count — "distinct users active in the trailing 7
# days, per day".  Window functions cannot express DISTINCT over a
# moving frame; the naive form joins every day against every activity
# row in its window (O(days x activity) — the oracle below, fine at
# test scale, a disaster at 100 TB).  The engine side uses the exact
# interval-boundary decomposition instead: per user, activity days
# sessionize with a 7-day gap into coverage intervals (each active day
# covers [d, d+6]); each interval contributes +1 at its start and -1
# the day after it ends; a prefix sum over the (tiny, post-aggregate)
# day spine is then the exact rolling distinct count.  Cost: one
# distinct, one per-user window, one day-cardinality global cumsum —
# O(activity), no day x user join.  The differential proves the
# decomposition equals the definitional query exactly.
# ---------------------------------------------------------------------------
_RD_WIN = 7  # trailing window, days


@query(
    "q_rolling_distinct_users",
    f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_active_7d
    FROM days d
    JOIN ud u ON u.day BETWEEN d.day - {_RD_WIN - 1} AND d.day
    GROUP BY d.day
    ORDER BY d.day
    """,
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("day")
    gap = F.datediff(F.col("day"), F.lag("day").over(wu))
    sess = F.sum(
        (gap.isNull() | (gap > _RD_WIN - 1)).cast("int")
    ).over(wu)
    intervals = (
        ud.withColumn("__sess", sess)
        .groupBy("user_id", "__sess")
        .agg(F.min("day").alias("start"), F.max("day").alias("end"))
    )
    deltas = intervals.select(
        F.col("start").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        intervals.select(
            F.date_add("end", _RD_WIN).alias("day"), F.lit(-1).alias("delta")
        )
    )
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    per_day = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    # day cardinality is tiny post-aggregate — the global cumsum window
    # is the safe Q3-class global window, never per-event
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    rolling = (
        spine.join(per_day, "day", "left")
        .withColumn("n", F.sum(F.coalesce("d", F.lit(0))).over(wd))
    )
    active_days = ud.select("day").distinct()
    return (
        rolling.join(active_days, "day")
        .select("day", F.col("n").cast("long").alias("n_active_7d"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Duplicated-span coverage — the exact-substring duplication signal
# (Lee et al. 2022) as a per-document score: fraction of a doc's distinct
# 5-token spans that occur in ≥1 other doc.  One span hash-agg + one
# linear equi-join back — never pairwise (see operators.dedup.span_coverage).
# ---------------------------------------------------------------------------
_SPAN_N = 5
_SQL_SPANS_5 = (
    f"CASE WHEN len(w) >= {_SPAN_N} THEN "
    f"list_distinct(list_transform(generate_series(1, len(w)-{_SPAN_N - 1}), "
    f"i -> array_to_string(w[i:i+{_SPAN_N - 1}], ' '))) "
    "ELSE []::VARCHAR[] END"
)


@query(
    "dedup_span_coverage",
    f"""
    WITH w AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    sh0 AS (SELECT doc_id, unnest({_SQL_SPANS_5}) AS span FROM w),
    sh AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(span), 1, 15) AS BIGINT) AS span_h
        FROM sh0
    ),
    sc AS (SELECT span_h, count(*) AS n_docs FROM sh GROUP BY span_h)
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN sc.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           round(sum(CASE WHEN sc.n_docs > 1 THEN 1 ELSE 0 END)
                 / count(*), 6) AS shared_frac
    FROM sh JOIN sc USING (span_h)
    GROUP BY sh.doc_id
    ORDER BY doc_id
    """,
)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.span_coverage(docs, n=_SPAN_N).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Token-budget corpus selection — "best docs until the budget is spent":
# keep the maximal (n_chars DESC, doc_id) prefix whose cumulative token
# count fits floor(0.4 · total tokens).  The running total is decomposed
# group-prefix + within-group-prefix (operators.selection) so no per-row
# global window appears in the plan; the budget is a broadcast scalar,
# never a collect.  n_chars stands in for any bounded-cardinality
# priority (rounded quality scores plug in unchanged).
# ---------------------------------------------------------------------------
@query(
    "pipeline_token_budget_select",
    f"""
    WITH d AS (
        SELECT doc_id, source, n_chars, len({SQL_TOKS}) AS n_tokens
        FROM documents
    ),
    b AS (SELECT CAST(floor(0.4 * sum(n_tokens)) AS BIGINT) AS budget FROM d),
    c AS (
        SELECT *, sum(n_tokens) OVER (
            ORDER BY n_chars DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum
        FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
    FROM c CROSS JOIN b
    WHERE cum <= budget
    GROUP BY source
    ORDER BY source
    """,
)
def pipeline_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import budget_scalar, ordered_prefix_by_budget

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(X.tokens_expr()).alias("n_tokens"),
    )
    kept = ordered_prefix_by_budget(
        d,
        budget_scalar(d, "n_tokens", 0.4),
        priority="n_chars",
        cost="n_tokens",
        key="doc_id",
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DSIR (Xie et al. 2023): importance-resample pool docs toward a target
# distribution over hashed unigram+bigram buckets.  Deterministic end to
# end — md5 buckets, md5 race uniforms — so the oracle reproduces every
# smoothed log-ratio, every doc weight and the exact k-selection.
# ---------------------------------------------------------------------------
_DSIR_M = 512  # feature buckets
_DSIR_K = 40   # docs to select
_DSIR_SQL_B = "CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 512"


@query(
    "pipeline_dsir_select",
    f"""
    WITH d AS (SELECT doc_id, lang, {SQL_TOKS} AS w FROM documents),
    g AS (
        SELECT doc_id, lang, w[i] AS g
        FROM d, unnest(generate_series(1, len(w))) AS t(i)
        UNION ALL
        SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS g
        FROM d, unnest(generate_series(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 2
    ),
    bk AS (SELECT doc_id, lang, {_DSIR_SQL_B} AS b FROM g),
    tc AS (SELECT b, count(*) AS ct FROM bk WHERE lang = 'en' GROUP BY b),
    sc AS (SELECT b, count(*) AS cs FROM bk WHERE lang <> 'en' GROUP BY b),
    tt AS (SELECT sum(ct) AS tot_t FROM tc),
    ss AS (SELECT sum(cs) AS tot_s FROM sc),
    r AS (
        SELECT coalesce(tc.b, sc.b) AS b,
               ln((coalesce(ct, 0) + 0.5) / (tot_t + 0.5 * {_DSIR_M}))
             - ln((coalesce(cs, 0) + 0.5) / (tot_s + 0.5 * {_DSIR_M})) AS r
        FROM tc FULL OUTER JOIN sc ON tc.b = sc.b
        CROSS JOIN tt CROSS JOIN ss
    ),
    db AS (SELECT doc_id, b, count(*) AS c FROM bk
           WHERE lang <> 'en' GROUP BY doc_id, b),
    sw AS (SELECT doc_id, sum(c * r) AS logw_raw
           FROM db JOIN r USING (b) GROUP BY doc_id),
    keyed AS (
        SELECT doc_id, logw_raw,
               ln(-ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                            1, 15) AS BIGINT) + 0.5)
                      / 1152921504606846976.0)) - logw_raw AS key_raw
        FROM sw
    )
    SELECT doc_id,
           round(logw_raw, 9) AS logw,
           round(key_raw, 9) AS sel_key
    FROM keyed
    ORDER BY sel_key, doc_id
    LIMIT {_DSIR_K}
    """,
)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): pick the {k} pool docs
    (non-English here, standing in for "raw web") whose hashed
    unigram+bigram distribution best matches the English target slice,
    via an Efraimidis–Spirakis race on the importance weights.  The
    corpus is tokenized ONCE into a shared (doc, bucket) aggregate whose
    exchange both consumers reuse (polarity rides it as max(is_target),
    not a grouping key — r12; the executed plan shows ReusedExchange,
    pinned by tests/test_selection.py), the 512-row log-ratio table
    broadcasts, and the selection is a global top-k."""
    from ..operators.selection import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "lang", X.tokens_expr().alias("w"))
    bigrams = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.array_join(F.slice("w", i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(F.col("w"), bigrams)
    return dsir_select(
        d,
        is_target=F.col("lang") == "en",
        grams=grams,
        id_col="doc_id",
        k=_DSIR_K,
        n_buckets=_DSIR_M,
        smoothing=0.5,
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): embedding-space
# near-duplicate removal — quantizer cells bound the pair space, exact
# cosine ≥ threshold verifies, connected components pick one
# representative (min id) per semantic cluster, the rest anti-join away.
# The embedding twin of pipeline_near_dedup_corpus: same composed shape
# (candidates → verify → components → anti-join), vectors instead of
# shingles.  Oracle = the same recursive-CTE fixpoint over the
# quantizer-pair definition.
# ---------------------------------------------------------------------------
@query(
    "pipeline_semantic_dedup",
    f"""
    WITH RECURSIVE e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS c_id, v AS cvv, sqrt(list_dot_product(v, v)) AS cnorm
        FROM e WHERE vec_id < {S.N_IVF_CELLS}
    ),
    vn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vnorm FROM e),
    csims AS (
        SELECT vn.vec_id, c.c_id,
               round(list_dot_product(vn.v, c.cvv) /
                     nullif(vn.vnorm * c.cnorm, 0.0), 6) AS csim
        FROM vn CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id, c_id AS cell FROM csims
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) <= 2
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT p.vec_a, p.vec_b
        FROM cand p
        JOIN e ea ON ea.vec_id = p.vec_a
        JOIN e eb ON eb.vec_id = p.vec_b
        WHERE round(list_dot_product(ea.v, eb.v) /
                    nullif(sqrt(list_dot_product(ea.v, ea.v)) *
                           sqrt(list_dot_product(eb.v, eb.v)), 0.0), 6) >= 0.45
    ),
    sym AS (
        SELECT vec_a AS a, vec_b AS b FROM pairs
        UNION
        SELECT vec_b AS a, vec_a AS b FROM pairs
    ),
    reach(node, lab) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
    ),
    comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
    dropped AS (SELECT node AS vec_id FROM comp WHERE node <> component)
    SELECT emb.label,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM embeddings emb
    LEFT JOIN dropped d ON emb.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
    GROUP BY emb.label
    ORDER BY emb.label
    """,
)
def pipeline_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.embedding_near_dup_ivf(emb, threshold=0.45)
    comp = connected_components(pairs, src="vec_a", dst="vec_b")
    dropped = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("vec_id")
    )
    kept = emb.join(dropped, "vec_id", "left_anti")
    return (
        kept.groupBy("label")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Exact-substring dedup REMOVAL (Lee et al. 2022's apply step): every
# shared 5-token span is cut from every doc except its lowest-id holder;
# cleaned_fp pins the rebuilt text bit-for-bit, so the differential
# verifies every surviving token position (see
# operators.dedup.remove_shared_spans for the scale shape).
# ---------------------------------------------------------------------------
@query(
    "dedup_span_removal",
    f"""
    WITH w AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    p AS (
        SELECT doc_id, w,
               unnest(CASE WHEN len(w) >= {_SPAN_N}
                      THEN generate_series(1, len(w)-{_SPAN_N - 1})
                      ELSE [] END) AS pos
        FROM w
    ),
    s AS (
        SELECT doc_id, pos,
               CAST('0x' || substr(md5(array_to_string(
                   w[pos:pos+{_SPAN_N - 1}], ' ')), 1, 15) AS BIGINT) AS span_h
        FROM p
    ),
    d AS (
        SELECT span_h, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_id
        FROM s GROUP BY span_h
    ),
    cov AS (
        SELECT DISTINCT s.doc_id, t.i
        FROM s JOIN d USING (span_h),
             unnest(generate_series(s.pos, s.pos+{_SPAN_N - 1})) AS t(i)
        WHERE d.n_docs > 1 AND s.doc_id <> d.keep_id
    ),
    ca AS (
        SELECT doc_id, count(*) AS n_removed, list(i) AS covlist
        FROM cov GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(len(w.w) AS BIGINT) AS n_tokens,
           CAST(coalesce(ca.n_removed, 0) AS BIGINT) AS n_removed,
           -- DuckDB: array_to_string([]) is NULL, Spark's array_join is ''
           md5(coalesce(array_to_string(list_filter(w.w,
               (x, i) -> NOT list_contains(coalesce(ca.covlist, []), i)),
               ' '), '')) AS cleaned_fp
    FROM w LEFT JOIN ca USING (doc_id)
    ORDER BY doc_id
    """,
    rotation=False,
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.remove_shared_spans(docs, n=_SPAN_N).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Naive-Bayes source classifier — the closed-form stand-in for the
# fastText-style classifier every corpus pipeline trains to score
# documents (CCNet / GPT-3 quality filtering): add-one-smoothed
# multinomial NB over the corpus's own (source, term) counts, every doc
# scored against every class, argmax → confusion matrix.  No ML library
# and no iterative optimizer, so it runs as three aggregates + one
# broadcast join.  Log-probs are quantized to integer micro-nats BEFORE
# summation: per-doc class scores are then exact BIGINT sums, making the
# argmax (and its cand-name tie-break) bit-identical cross-engine — no
# float-accumulation-order drift in the decision, the same integer trick
# as q_ewma_hourly.  At scale: the (vocab × sources) model table
# broadcasts; the scoring join fans each token ×|sources| with map-side
# partial aggregation collapsing to (doc × sources) before the shuffle.
# ---------------------------------------------------------------------------
@query(
    "text_source_classifier",
    f"""
    WITH t AS (SELECT doc_id, source, unnest({SQL_TOKS}) AS term FROM documents),
    cnts AS (SELECT source, term, count(*) AS cnt FROM t GROUP BY source, term),
    totals AS (SELECT source, count(*) AS n_s FROM t GROUP BY source),
    vocab AS (SELECT DISTINCT term FROM t),
    v AS (SELECT count(*) AS v FROM vocab),
    grid AS (
        SELECT totals.source AS cand, vocab.term,
               CAST(floor(1000000.0 * ln((coalesce(cnts.cnt, 0) + 1.0)
                                         / (totals.n_s + v.v))) AS BIGINT)
                   AS lp_q
        FROM vocab CROSS JOIN totals
        LEFT JOIN cnts ON cnts.source = totals.source
                      AND cnts.term = vocab.term
        CROSS JOIN v
    ),
    scored AS (
        SELECT t.doc_id, t.source, g.cand, sum(g.lp_q) AS score_q
        FROM t JOIN grid g USING (term)
        GROUP BY t.doc_id, t.source, g.cand
    ),
    pred AS (
        SELECT doc_id, source, cand FROM scored
        QUALIFY row_number() OVER (
            PARTITION BY doc_id ORDER BY score_q DESC, cand) = 1
    )
    SELECT source AS true_source, cand AS predicted,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY source, cand
    ORDER BY true_source, predicted
    """,
)
def text_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", F.explode(X.tokens_expr()).alias("term"))
    cnts = t.groupBy("source", "term").agg(F.count("*").alias("cnt"))
    totals = t.groupBy("source").agg(F.count("*").alias("n_s"))
    vocab = t.select("term").distinct()
    v_size = vocab.agg(F.count("*").alias("v"))
    grid = (
        vocab.crossJoin(totals)
        .join(cnts, ["source", "term"], "left")
        .crossJoin(F.broadcast(v_size))
        .select(
            F.col("source").alias("cand"),
            "term",
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_s") + F.col("v"))
                )
            )
            .cast("long")
            .alias("lp_q"),
        )
    )
    scored = (
        t.join(F.broadcast(grid), "term")
        .groupBy("doc_id", "source", "cand")
        .agg(F.sum("lp_q").alias("score_q"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), F.asc("cand"))
    pred = scored.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return (
        pred.groupBy(
            F.col("source").alias("true_source"),
            F.col("cand").alias("predicted"),
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy("true_source", "predicted")
    )


# ---------------------------------------------------------------------------
# Trailing-window anomaly flags — the monitoring query a continuous
# pipeline runs over its own throughput: per (event_type, hour), flag
# counts more than 3 sigma from the trailing-24h mean.  The z-test is
# algebraically cleared of division and sqrt —
#     (x − μ)² > 9σ²  ⇔  (n·x − Σx)² > 9·(n·Σx² − (Σx)²)
# — so every quantity is an exact integer (the q_ewma_hourly trick):
# no float accumulation anywhere, the flag is bit-identical
# cross-engine with no rounding rule.  Keyed RANGE window (hour-index
# values, not rows — missing hours need no gap-fill spine); partitioned
# by event_type, so at scale it is one keyed window over post-aggregate
# rows.  BIGINT headroom: (n·x − Σx)² ≤ (24·max_hourly_count)², which
# overflows 2⁶³ once a single (type, hour) exceeds ~1.2e8 events — cast
# the two compare operands to DECIMAL(38,0) beyond that rate (the test
# SFs sit ~5 orders of magnitude below it).
# ---------------------------------------------------------------------------
@query(
    "q_anomaly_hours",
    """
    WITH h AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS hr
        FROM events
    ),
    hourly AS (SELECT event_type, hr, count(*) AS cnt FROM h GROUP BY 1, 2),
    wstat AS (
        SELECT event_type, hr, cnt,
               count(*) OVER w AS n_w,
               sum(cnt) OVER w AS sx,
               sum(cnt * cnt) OVER w AS sxx
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hr
                     RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hr, cnt,
           CAST(n_w AS BIGINT) AS n_window,
           CAST((n_w * cnt - sx) * (n_w * cnt - sx) AS BIGINT)
               > CAST(9 * (n_w * sxx - sx * sx) AS BIGINT) AS is_anomaly
    FROM wstat
    ORDER BY event_type, hr
    """,
)
def q_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / F.lit(3600))
            .cast("long")
            .alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rangeBetween(-23, Window.currentRow)
    )
    n_w = F.count("*").over(w)
    sx = F.sum("cnt").over(w)
    sxx = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    lhs = n_w * F.col("cnt") - sx
    return (
        hourly.select(
            "event_type",
            "hr",
            "cnt",
            n_w.cast("long").alias("n_window"),
            ((lhs * lhs) > F.lit(9) * (n_w * sxx - sx * sx)).alias(
                "is_anomaly"
            ),
        )
        .orderBy("event_type", "hr")
    )


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (the LBFS/rsync construction on text):
# local-content boundaries keep chunk identity stable under edits, and
# chunks are NON-overlapping — ~tokens/16 rows through the sharing join
# vs span_coverage's one-per-token, the cheaper corpus-level signal at
# coarser resolution.  See operators.dedup.cdc_chunk_stats.
# ---------------------------------------------------------------------------
@query(
    "dedup_cdc_chunks",
    f"""
    WITH w AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    p AS (
        SELECT doc_id, unnest(w) AS tok,
               unnest(generate_series(1, len(w))) AS pos
        FROM w
    ),
    b AS (
        SELECT doc_id, pos, tok,
               CASE WHEN CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)
                         % 16 = 0
                    THEN 1 ELSE 0 END AS is_b
        FROM p
    ),
    c AS (
        SELECT doc_id, pos, tok,
               sum(is_b) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS chunk_id
        FROM b
    ),
    chunks AS (
        SELECT doc_id, chunk_id,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
        FROM c GROUP BY doc_id, chunk_id
    ),
    dc AS (SELECT DISTINCT doc_id, chunk_fp FROM chunks),
    cf AS (SELECT chunk_fp, count(*) AS n_docs FROM dc GROUP BY chunk_fp)
    SELECT dc.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN cf.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           round(sum(CASE WHEN cf.n_docs > 1 THEN 1 ELSE 0 END)
                 / count(*), 6) AS shared_frac
    FROM dc JOIN cf USING (chunk_fp)
    GROUP BY dc.doc_id
    ORDER BY doc_id
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.cdc_chunk_stats(docs, mod=16).orderBy("doc_id")


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization + asymmetric-distance scoring — the third
# compression tier of the ANN stack (Flat -> SQ8 -> PQ; see
# operators.similarity.knn_ivf_pq).  Every per-term squared distance is
# floored to integer micro-units BEFORE summation, so codebook argmins
# and ADC sums are exact BIGINT arithmetic on both engines — the output
# integer distances differential with no rounding rule.
# ---------------------------------------------------------------------------
_SQL_PQ_DQ = (
    "list_sum(list_transform(generate_series(1, {sd}), "
    "i -> CAST(floor((({a}[i] - {b}[i]) * ({a}[i] - {b}[i])) * 1000000.0) "
    "AS BIGINT)))"
)


@query(
    "sim_knn_ivf_pq",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    en AS (
        SELECT vec_id,
               CASE WHEN nrm = 0 THEN v
                    ELSE list_transform(v, x -> x / nrm) END AS v
        FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
              FROM e) t
    ),
    sp AS (SELECT unnest(generate_series(0, {S.PQ_M - 1})) AS s),
    cb AS (
        SELECT en.vec_id AS pq_c, sp.s,
               en.v[sp.s*{S.PQ_SUBDIM}+1 : sp.s*{S.PQ_SUBDIM}+{S.PQ_SUBDIM}]
                   AS csub
        FROM en, sp WHERE en.vec_id < {S.PQ_K}
    ),
    subs AS (
        SELECT en.vec_id, sp.s,
               en.v[sp.s*{S.PQ_SUBDIM}+1 : sp.s*{S.PQ_SUBDIM}+{S.PQ_SUBDIM}]
                   AS sub
        FROM en, sp
    ),
    enc AS (
        SELECT vec_id, s, pq_c AS code FROM (
            SELECT subs.vec_id, subs.s, cb.pq_c,
                   {_SQL_PQ_DQ.format(sd=S.PQ_SUBDIM, a="subs.sub", b="cb.csub")} AS d_q
            FROM subs JOIN cb USING (s)
        )
        QUALIFY row_number() OVER (
            PARTITION BY vec_id, s ORDER BY d_q, pq_c) = 1
    ),
    adc AS (
        SELECT subs.vec_id AS query_id, subs.s, cb.pq_c AS code,
               {_SQL_PQ_DQ.format(sd=S.PQ_SUBDIM, a="subs.sub", b="cb.csub")} AS d_q
        FROM subs JOIN cb USING (s)
        WHERE subs.vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})
    ),
    cent AS (SELECT vec_id AS c_id, v AS cvv FROM e WHERE vec_id < {S.N_IVF_CELLS}),
    csims AS (
        SELECT e.vec_id, c.c_id,
               round(list_dot_product(e.v, c.cvv) /
                     nullif(sqrt(list_dot_product(e.v, e.v)) *
                            sqrt(list_dot_product(c.cvv, c.cvv)), 0.0), 6) AS csim
        FROM e CROSS JOIN cent c
    ),
    assign AS (
        SELECT vec_id, c_id AS cell FROM csims
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) = 1
    ),
    probe AS (
        SELECT vec_id AS query_id, c_id AS cell FROM csims
        WHERE vec_id IN ({", ".join(str(i) for i in KNN_QUERY_IDS)})
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) <= {S.IVF_PROBES}
    ),
    pairs AS (
        SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
        FROM probe p JOIN assign a ON a.cell = p.cell
        WHERE p.query_id <> a.vec_id
    ),
    scored AS (
        SELECT pr.query_id, pr.neighbor_id,
               CAST(sum(adc.d_q) AS BIGINT) AS adc_dist_q
        FROM pairs pr
        JOIN enc ON enc.vec_id = pr.neighbor_id
        JOIN adc ON adc.query_id = pr.query_id
                AND adc.s = enc.s AND adc.code = enc.code
        GROUP BY pr.query_id, pr.neighbor_id
    )
    SELECT query_id, neighbor_id, adc_dist_q FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dist_q, neighbor_id) <= 10
    """,
    rotation=False,
)
def sim_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_ivf_pq(emb, KNN_QUERY_IDS, k=10)


# ---------------------------------------------------------------------------
# Population-stability drift (PSI) — the data-quality monitor a corpus
# pipeline runs when a source's distribution may have shifted: per
# event_type, PSI between the early and late halves of the time range
# over 10 equal-width value buckets, Laplace-smoothed.  PSI terms
# (p−q)·ln(p/q) are non-negative and are floored to integer NANO-units
# BEFORE the per-type sum, so the statistic and the drift flag are
# exact BIGINT arithmetic (the classifier/anomaly trick).  Empty
# buckets matter (that's where drift shows), so the (type × bucket)
# grid is generated and counts coalesce to 0.  Shape: two scalar
# aggregates broadcast, one (type, bucket) hash-agg, one tiny grid
# join — nothing scales with more than the event count.
# ---------------------------------------------------------------------------
@query(
    "q_psi_value_drift",
    """
    WITH s AS (
        SELECT (min(floor(epoch(ts))) + max(floor(epoch(ts)))) / 2.0 AS mid,
               min(value) AS vmin, max(value) AS vmax
        FROM events WHERE value IS NOT NULL
    ),
    b AS (
        SELECT e.event_type,
               -- degenerate range (vmax == vmin) floors to NULL via the
               -- nullif: make the NULL -> bucket 0 rule EXPLICIT before
               -- least (least skips NULLs on both engines, so least(9,
               -- NULL) would silently pick 9; ADVICE r5)
               least(9, coalesce(
                   CAST(floor((e.value - s.vmin) * 10.0 /
                        nullif(s.vmax - s.vmin, 0.0)) AS BIGINT), 0)) AS bkt,
               CASE WHEN floor(epoch(e.ts)) < s.mid THEN 1 ELSE 0 END AS early
        FROM events e CROSS JOIN s
        WHERE e.value IS NOT NULL
    ),
    c AS (
        SELECT event_type, bkt,
               sum(early) AS ce, sum(1 - early) AS cl
        FROM b GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, g.bkt
        FROM (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL) t,
             (SELECT unnest(generate_series(0, 9)) AS bkt) g
    ),
    f AS (
        SELECT grid.event_type, grid.bkt,
               coalesce(c.ce, 0) AS ce, coalesce(c.cl, 0) AS cl
        FROM grid LEFT JOIN c USING (event_type, bkt)
    ),
    tot AS (
        SELECT event_type, sum(ce) AS te, sum(cl) AS tl
        FROM f GROUP BY 1
    ),
    terms AS (
        SELECT f.event_type,
               CAST(floor((((f.ce + 1.0) / (tot.te + 10.0))
                           - ((f.cl + 1.0) / (tot.tl + 10.0)))
                          * ln(((f.ce + 1.0) / (tot.te + 10.0))
                               / ((f.cl + 1.0) / (tot.tl + 10.0)))
                          * 1000000000.0) AS BIGINT) AS term_q
        FROM f JOIN tot USING (event_type)
    )
    SELECT event_type,
           CAST(sum(term_q) AS BIGINT) AS psi_nano,
           sum(term_q) > 200000000 AS is_drift
    FROM terms GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return psi_value_drift(events)


def psi_value_drift(events: DataFrame) -> DataFrame:
    """PSI drift statistic per event_type (see the section comment);
    factored out so crafted-distribution tests can drive it directly."""
    spark = events.sparkSession
    events = events.filter(F.col("value").isNotNull())
    ep = F.floor(F.unix_timestamp("ts"))
    s = events.agg(
        ((F.min(ep) + F.max(ep)) / F.lit(2.0)).alias("mid"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    # degenerate range (vmax == vmin): the nullif makes the floor NULL;
    # coalesce to bucket 0 BEFORE least — F.least skips NULLs, so
    # least(9, NULL) would silently bucket to 9 (ADVICE r5); any engine
    # whose least propagates NULL would diverge.  Explicit on both sides.
    b = events.crossJoin(F.broadcast(s)).select(
        "event_type",
        F.least(
            F.lit(9),
            F.coalesce(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * F.lit(10.0)
                    / F.nullif(F.col("vmax") - F.col("vmin"), F.lit(0.0))
                ).cast("long"),
                F.lit(0).cast("long"),
            ),
        ).alias("bkt"),
        F.when(ep < F.col("mid"), F.lit(1)).otherwise(F.lit(0)).alias("early"),
    )
    c = (
        b.groupBy("event_type", "bkt")
        .agg(
            F.sum("early").alias("ce"),
            F.sum(F.lit(1) - F.col("early")).alias("cl"),
        )
    )
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(10).select(F.col("id").cast("long").alias("bkt"))
        )
    )
    f = grid.join(c, ["event_type", "bkt"], "left").select(
        "event_type",
        "bkt",
        F.coalesce("ce", F.lit(0)).alias("ce"),
        F.coalesce("cl", F.lit(0)).alias("cl"),
    )
    tot = f.groupBy("event_type").agg(
        F.sum("ce").alias("te"), F.sum("cl").alias("tl")
    )
    p = (F.col("ce") + F.lit(1.0)) / (F.col("te") + F.lit(10.0))
    q = (F.col("cl") + F.lit(1.0)) / (F.col("tl") + F.lit(10.0))
    term_q = F.floor((p - q) * F.log(p / q) * F.lit(1000000000.0)).cast("long")
    terms = f.join(tot, "event_type").select(
        "event_type", term_q.alias("term_q")
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.sum("term_q").cast("long").alias("psi_nano"),
            (F.sum("term_q") > F.lit(200000000)).alias("is_drift"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix — the provenance diagnostic before
# mixing sources: for every source pair, how many distinct 5-token
# spans appear in BOTH (the same boilerplate/article syndicated into
# two crawls inflates that pair; exact-fingerprint overlap is zero on
# this corpus, so the span granularity is what actually measures
# leakage).  One (source, span-hash) distinct aggregate + a
# per-span pair expansion bounded by distinct sources per span.
# ---------------------------------------------------------------------------
@query(
    "dedup_cross_source_overlap",
    f"""
    WITH w AS (SELECT doc_id, source, {SQL_TOKS} AS w FROM documents),
    sh AS (
        SELECT DISTINCT source,
               CAST('0x' || substr(md5(span), 1, 15) AS BIGINT) AS span_h
        FROM (SELECT doc_id, source, unnest({_SQL_SPANS_5}) AS span FROM w)
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_spans
    FROM sh a JOIN sh b ON a.span_h = b.span_h AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ex = D._exploded_shingles(docs, "text", "doc_id", 5)
    src_spans = (
        ex.join(docs.select("doc_id", "source"), "doc_id")
        .select("source", D._token_hash60(F.col("shingle")).alias("span_h"))
        .distinct()
    )
    a = src_spans.select(F.col("span_h"), F.col("source").alias("source_a"))
    b = src_spans.select(F.col("span_h"), F.col("source").alias("source_b"))
    return (
        a.join(b, "span_h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_spans"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Perplexity filtering, APPLIED (CCNet's actual keep/drop step): score
# every doc with the corpus-unigram fluency signal (text_unigram_logprob's
# expression, rounded 6 BEFORE thresholding so both engines cut the same
# set), take the exact interpolated p90 as the cut (Spark `percentile`
# == DuckDB `quantile_cont`, rounded 6), drop docs above it, report
# per-source keep/drop counts.  Shape: the two unigram aggregates + one
# ordered-agg scalar broadcast + one narrow filter — no new shuffle
# class beyond the scoring pass itself.
# ---------------------------------------------------------------------------
@query(
    "pipeline_perplexity_filter",
    f"""
    WITH t AS (
        SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents
    ),
    v AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
    g AS (SELECT (SELECT count(*) FROM t) AS n, (SELECT count(*) FROM v) AS vs),
    scored AS (
        SELECT t.doc_id,
               round(avg(-ln((v.cnt + 1.0) / (g.n + g.vs))), 6) AS nlp
        FROM t JOIN v USING (term) CROSS JOIN g
        GROUP BY t.doc_id
    ),
    cut AS (SELECT round(quantile_cont(nlp, 0.9), 6) AS p90 FROM scored)
    SELECT d.source,
           CAST(sum(CASE WHEN s.nlp <= cut.p90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN s.nlp > cut.p90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped
    FROM documents d
    JOIN scored s USING (doc_id)
    CROSS JOIN cut
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def pipeline_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.explode(X.tokens_expr()).alias("term"))
    v = t.groupBy("term").agg(F.count("*").alias("cnt"))
    g = t.agg(F.count("*").alias("n")).crossJoin(
        v.agg(F.count("*").alias("vs"))
    )
    scored = (
        t.join(v, "term")
        .crossJoin(F.broadcast(g))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(
                    -F.log(
                        (F.col("cnt") + F.lit(1.0))
                        / (F.col("n") + F.col("vs"))
                    )
                ),
                6,
            ).alias("nlp")
        )
    )
    cut = scored.agg(
        F.round(F.expr("percentile(nlp, 0.9)"), 6).alias("p90")
    )
    kept_flag = (F.col("nlp") <= F.col("p90")).cast("long")
    return (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .crossJoin(F.broadcast(cut))
        .groupBy("source")
        .agg(
            F.sum(kept_flag).alias("n_kept"),
            F.sum(F.lit(1) - kept_flag).alias("n_dropped"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketches — operators/sketch.py.  The
# deterministic, MERGEABLE sketch family member next to HLL: md5-derived
# 60-bit hashes make every estimate reproducible in the DuckDB twin
# (hash-gate exact, unlike approx_count_distinct), and "k smallest of the
# union from per-part k-smallest" is the property that lets 1000
# executors summarize 100 TB into k longs each and combine on one
# reducer.  The oracles mirror the estimator arithmetic token-for-token:
# ((k-1)·2^60)/h_k in int64 → IEEE double (exact-quotient class — no
# rounding, per the oracle-twin rounding rule).
# ---------------------------------------------------------------------------
_KMV_K = 128
_KMV_SQL_H = "CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)"
_KMV_SQL_EST = (
    f"CASE WHEN n_k < {_KMV_K} THEN CAST(n_k AS DOUBLE) "
    f"ELSE ({_KMV_K - 1}.0 * 1152921504606846976.0) / CAST(kth AS DOUBLE) END"
)
# Items are 3-token SHINGLES, not tokens: the synthetic corpus has a
# 31-word vocabulary, which would never fill a k=128 sketch (the
# estimator branch would be dead code in the differential); per-source
# distinct shingles run ~1.1-1.6k, so the sketches saturate and the
# estimates are real.  Shingle sets are also what corpus-overlap
# monitoring actually sketches.
_KMV_SQL_ITEMS = (
    f"WITH kw AS (SELECT source, {SQL_TOKS} AS w FROM documents),\n"
    f"    t AS (SELECT source, unnest({SQL_SHINGLES}) AS tok FROM kw)"
)


def _kmv_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("source", X.tokens_expr().alias("w")).select(
        "source", F.explode(D.shingles_from_tokens(F.col("w"))).alias("tok")
    )


@query(
    "sketch_kmv_distinct",
    f"""
    {_KMV_SQL_ITEMS},
    h AS (SELECT DISTINCT source, {_KMV_SQL_H} AS h FROM t),
    r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM h),
    s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_k, max(h) AS kth
          FROM r WHERE rn <= {_KMV_K} GROUP BY source),
    x AS (SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct
          FROM h GROUP BY source)
    SELECT s.source, x.exact_distinct, s.n_k, s.kth,
           {_KMV_SQL_EST} AS est_distinct
    FROM s JOIN x USING (source)
    ORDER BY source
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token cardinality: exact count vs the KMV
    estimate.  The exact column is itself one distinct+count aggregate
    (a legitimate scale op); the sketch path is what survives when even
    that is too much state per group."""
    from ..operators import sketch as K

    toks = _kmv_items(spark, sf_dir)
    sk = K.kmv_sketch(toks, ["source"], F.col("tok"), k=_KMV_K)
    exact = (
        toks.distinct()
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("exact_distinct"))
    )
    return (
        sk.join(exact, "source")
        .select(
            "source",
            "exact_distinct",
            "n_k",
            "kth",
            K.kmv_estimate_expr(_KMV_K).alias("est_distinct"),
        )
        .orderBy("source")
    )


@query(
    "sketch_kmv_merge",
    f"""
    {_KMV_SQL_ITEMS},
    h AS (SELECT DISTINCT source, {_KMV_SQL_H} AS h FROM t),
    -- direct: k smallest over ALL sources' distinct hashes.  (source, h)
    -- pairs dedup to distinct h first: equal hashes from different
    -- sources are one item, exactly as the merge path sees them.
    hd AS (SELECT DISTINCT h FROM h),
    d AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hd),
    direct AS (SELECT CAST(count(*) AS BIGINT) AS n_k, max(h) AS kth
               FROM d WHERE rn <= {_KMV_K}),
    -- merged: per-source k smallest FIRST, then k smallest of that union
    -- (the distributed combine) — must equal the direct sketch exactly
    r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM h),
    parts AS (SELECT DISTINCT h FROM r WHERE rn <= {_KMV_K}),
    m AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM parts),
    merged AS (SELECT CAST(count(*) AS BIGINT) AS n_k, max(h) AS kth
               FROM m WHERE rn <= {_KMV_K})
    SELECT 'all' AS grp,
           direct.n_k AS n_k_direct,
           direct.kth AS kth_direct,
           (SELECT {_KMV_SQL_EST} FROM direct) AS est_direct,
           merged.n_k AS n_k_merged,
           merged.kth AS kth_merged,
           (SELECT {_KMV_SQL_EST} FROM merged) AS est_merged
    FROM direct, merged
    """,
    rotation=False,
)
def sketch_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-equivalence, the property 100 TB hangs on: per-source
    sketches combined via :func:`kmv_merge_sketches` must equal the
    sketch built over the whole corpus directly — k longs per part are
    a lossless summary for the k-min statistic."""
    from ..operators import sketch as K

    toks = _kmv_items(spark, sf_dir)
    direct = K.kmv_sketch(
        toks.withColumn("grp", F.lit("all")), ["grp"], F.col("tok"), k=_KMV_K
    )
    per_source = K.kmv_sketch(toks, ["source"], F.col("tok"), k=_KMV_K)
    merged = K.kmv_merge_sketches(
        per_source.withColumn("grp", F.lit("all")), ["grp"], k=_KMV_K
    )
    d = direct.select(
        "grp",
        F.col("n_k").alias("n_k_direct"),
        F.col("kth").alias("kth_direct"),
        K.kmv_estimate_expr(_KMV_K).alias("est_direct"),
    )
    m = merged.select(
        "grp",
        F.col("n_k").alias("n_k_merged"),
        F.col("kth").alias("kth_merged"),
        K.kmv_estimate_expr(_KMV_K).alias("est_merged"),
    )
    return d.join(m, "grp")


@query(
    "sketch_kmv_source_jaccard",
    f"""
    {_KMV_SQL_ITEMS},
    h AS (SELECT DISTINCT source, {_KMV_SQL_H} AS h FROM t),
    r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM h),
    s AS (SELECT source, list(h ORDER BY h) AS ks
          FROM r WHERE rn <= {_KMV_K} GROUP BY source),
    p AS (
        SELECT a.source AS src_a, b.source AS src_b,
               (list_sort(list_distinct(list_concat(a.ks, b.ks))))[1:{_KMV_K}] AS uk,
               a.ks AS ka, b.ks AS kb
        FROM s a JOIN s b ON a.source < b.source
    ),
    q AS (
        SELECT src_a, src_b, uk,
               CAST(len(list_intersect(list_intersect(uk, ka), kb)) AS DOUBLE)
                   / CAST(len(uk) AS DOUBLE) AS j_est
        FROM p
    )
    SELECT src_a, src_b, j_est,
           CASE WHEN len(uk) < {_KMV_K} THEN CAST(len(uk) AS DOUBLE)
                ELSE ({_KMV_K - 1}.0 * 1152921504606846976.0)
                     / CAST(uk[{_KMV_K}] AS DOUBLE) END AS union_est,
           j_est * (CASE WHEN len(uk) < {_KMV_K} THEN CAST(len(uk) AS DOUBLE)
                    ELSE ({_KMV_K - 1}.0 * 1152921504606846976.0)
                         / CAST(uk[{_KMV_K}] AS DOUBLE) END) AS inter_est
    FROM q
    ORDER BY src_a, src_b
    """,
    rotation=False,
)
def sketch_kmv_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs source similarity from sketches alone: a G-source
    corpus moves G²·k int64s through the pair join — the data itself
    never shuffles, which is the whole point at 100 TB.  Accuracy vs
    exact Jaccard is pytest-gated (tests/test_sketch.py); the driver
    gate here is Spark≡DuckDB determinism."""
    from ..operators import sketch as K

    toks = _kmv_items(spark, sf_dir)
    sk = K.kmv_sketch(toks, ["source"], F.col("tok"), k=_KMV_K)
    a = sk.select(F.col("source").alias("src_a"), F.col("ks").alias("ka"))
    b = sk.select(F.col("source").alias("src_b"), F.col("ks").alias("kb"))
    pairs = a.join(b, F.col("src_a") < F.col("src_b"))
    cols = K.kmv_jaccard_cols(F.col("ka"), F.col("kb"), _KMV_K)
    return pairs.select(
        "src_a",
        "src_b",
        cols["j_est"].alias("j_est"),
        cols["union_est"].alias("union_est"),
        cols["inter_est"].alias("inter_est"),
    ).orderBy("src_a", "src_b")


# --- Count-min sketch (operators/sketch.py cms_*) --------------------------
# Mergeable frequency summary next to KMV's distinct summary: d·w counters
# per group, point estimates = min over d md5-salted hash rows, never an
# UNDER-estimate.  Deterministic hashing makes every cell and estimate
# reproducible in the DuckDB twin (Spark's own `count_min_sketch` returns
# an engine-private binary blob, useless for a differential).

_CMS_D = 4
_CMS_W = 512
_CMS_TOP = 12
# cell index of `tok` in hash row r (DuckDB twin of sketch.cms_hash_expr)
_CMS_SQL_C = (
    "CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok), 1, 15) "
    "AS BIGINT) % {w}"
).format(w=_CMS_W)
_CMS_SQL_ROWS = "rows_(r) AS (SELECT unnest(range(0, {d})))".format(d=_CMS_D)


@query(
    "sketch_cms_counts",
    f"""
    {_KMV_SQL_ITEMS},
    {_CMS_SQL_ROWS},
    ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
           FROM t GROUP BY tok),
    probes AS (SELECT tok, exact_cnt FROM ex
               ORDER BY exact_cnt DESC, tok LIMIT {_CMS_TOP}),
    cells AS (SELECT r, {_CMS_SQL_C} AS c, CAST(count(*) AS BIGINT) AS cnt
              FROM t CROSS JOIN rows_ GROUP BY 1, 2),
    pc AS (SELECT tok, exact_cnt, r, {_CMS_SQL_C} AS c
           FROM probes CROSS JOIN rows_)
    SELECT tok, exact_cnt,
           CAST(min(cnt) AS BIGINT) AS est_cnt,
           min(cnt) >= max(exact_cnt) AS never_under
    FROM pc JOIN cells USING (r, c)
    GROUP BY tok, exact_cnt
    ORDER BY exact_cnt DESC, tok
    """,
)
def sketch_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point estimates vs exact document-frequency for the corpus's
    top shingles.  The exact side is one count aggregate (fine here;
    the sketch is what survives when per-item exact state cannot);
    `never_under` pins the one-sided error guarantee in the
    differential itself."""
    from ..operators import sketch as K

    items = _kmv_items(spark, sf_dir)
    exact = items.groupBy(F.col("tok")).agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    probes = exact.orderBy(F.desc("exact_cnt"), "tok").limit(_CMS_TOP)
    sk = K.cms_sketch(items, [], F.col("tok"), depth=_CMS_D, width=_CMS_W)
    est = K.cms_lookup(sk, probes, "tok", depth=_CMS_D, width=_CMS_W)
    return (
        probes.join(est, "tok")
        .select(
            "tok",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("never_under"),
        )
        .orderBy(F.desc("exact_cnt"), "tok")
    )


@query(
    "sketch_cms_merge",
    f"""
    {_KMV_SQL_ITEMS},
    {_CMS_SQL_ROWS},
    ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
           FROM t GROUP BY tok),
    probes AS (SELECT tok FROM ex ORDER BY exact_cnt DESC, tok
               LIMIT {_CMS_TOP}),
    -- per-source sketches, then the merge = SUM over sources per cell;
    -- by associativity this equals the direct global sketch, which is
    -- exactly the mergeability property the query pins.
    per_src AS (SELECT source, r, {_CMS_SQL_C} AS c,
                       CAST(count(*) AS BIGINT) AS cnt
                FROM t CROSS JOIN rows_ GROUP BY 1, 2, 3),
    merged AS (SELECT r, c, CAST(sum(cnt) AS BIGINT) AS cnt
               FROM per_src GROUP BY r, c),
    direct AS (SELECT r, {_CMS_SQL_C} AS c, CAST(count(*) AS BIGINT) AS cnt
               FROM t CROSS JOIN rows_ GROUP BY 1, 2),
    pc AS (SELECT tok, r, {_CMS_SQL_C} AS c FROM probes CROSS JOIN rows_)
    SELECT pc.tok,
           CAST(min(m.cnt) AS BIGINT) AS est_merged,
           CAST(min(d2.cnt) AS BIGINT) AS est_direct,
           min(m.cnt) = min(d2.cnt) AS merge_exact
    FROM pc
    JOIN merged m ON pc.r = m.r AND pc.c = m.c
    JOIN direct d2 ON pc.r = d2.r AND pc.c = d2.c
    GROUP BY pc.tok
    ORDER BY pc.tok
    """,
    rotation=False,
)
def sketch_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-combine property, pinned end-to-end: sketches built
    per source and merged with :func:`cms_merge` give the same
    estimates as one sketch built over the whole corpus — shards can
    sketch independently and combine d·w counters apiece."""
    from ..operators import sketch as K

    items = _kmv_items(spark, sf_dir)
    exact = items.groupBy("tok").agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    probes = exact.orderBy(F.desc("exact_cnt"), "tok").limit(_CMS_TOP).select("tok")
    per_src = K.cms_sketch(
        items, ["source"], F.col("tok"), depth=_CMS_D, width=_CMS_W
    )
    merged = K.cms_merge(per_src.drop("source"), [])
    direct = K.cms_sketch(items, [], F.col("tok"), depth=_CMS_D, width=_CMS_W)
    em = K.cms_lookup(merged, probes, "tok", depth=_CMS_D, width=_CMS_W)
    ed = K.cms_lookup(direct, probes, "tok", depth=_CMS_D, width=_CMS_W)
    return (
        em.withColumnRenamed("est_cnt", "est_merged")
        .join(ed.withColumnRenamed("est_cnt", "est_direct"), "tok")
        .select(
            "tok",
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct")).alias("merge_exact"),
        )
        .orderBy("tok")
    )


_SQK = 256


@query(
    "sketch_sample_quantiles",
    f"""
    WITH h AS (SELECT event_type, value, event_id,
                      CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                           1, 15) AS BIGINT) AS hh
               FROM events),
    r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY hh) AS rn FROM h),
    s AS (SELECT event_type, value, event_id FROM r WHERE rn <= {_SQK}),
    rk AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS vr,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM s)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_sample,
           max(CASE WHEN vr = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                    THEN value END) AS p50,
           max(CASE WHEN vr = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
                    THEN value END) AS p90,
           max(CASE WHEN vr = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
                    THEN value END) AS p99
    FROM rk GROUP BY event_type
    ORDER BY event_type
    """,
)
def sketch_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: a bottom-k row sample (k smallest
    md5(event_id) hashes per group — merge = k smallest of the union,
    the KMV property over ROWS) and exact type-1 quantiles of the
    sample.  Rank error is O(1/sqrt(k)), pytest-gated vs exact
    population quantiles (tests/test_sketch.py); picked values are
    bit-exact so the differential needs no rounding — unlike
    percentile_approx, whose digest is engine-private."""
    from ..operators import sketch as K

    ev = load_table(spark, sf_dir, "events")
    sample = K.bottomk_sample(
        ev.select("event_type", "value", "event_id"),
        ["event_type"],
        F.col("event_id").cast("string"),
        k=_SQK,
    )
    return K.sample_quantiles(
        sample,
        ["event_type"],
        "value",
        [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)],
        tie_break="event_id",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Data-quality expectations — operators/expectations.py.  The REPORT and
# QUARANTINE surface next to the sink's hard CHECK constraints: per-rule
# violation counts (all row-predicates in ONE aggregate pass; uniqueness
# one hash agg; referential integrity one anti-join) and the map-side
# clean/violating row split.  The TPC-H fixtures are clean, so — same
# device as the PII queries — each query works on a deterministically
# DIRTIED frame (dupes / NULLs / orphan FKs / sign flips keyed off
# o_orderkey residues), mirrored in the oracle: the differential then
# verifies the rules CATCH, not that zero equals zero.
# ---------------------------------------------------------------------------
_DQ_DIRTY_ORDERS_SQL = """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 83 = 0 THEN -o_custkey ELSE o_custkey END
               AS o_custkey,
           o_orderstatus,
           CASE WHEN o_orderkey % 79 = 0 THEN -o_totalprice
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 89 = 0 THEN NULL
                ELSE o_orderdate END AS o_orderdate
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey % 97 = 0
"""


def _dq_dirty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dirt = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 83 == 0, -F.col("o_custkey"))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 79 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 89 == 0, F.lit(None))
        .otherwise(F.col("o_orderdate"))
        .alias("o_orderdate"),
    )
    dup = o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    return dirt.unionByName(dup)


@query(
    "dq_orders_report",
    f"""
    WITH d AS ({_DQ_DIRTY_ORDERS_SQL}),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM d)
    SELECT * FROM (
        SELECT 'fk_custkey' AS rule, 'foreign_key' AS kind,
               CAST((SELECT count(*) FROM d
                     WHERE o_custkey IS NOT NULL
                       AND o_custkey NOT IN (SELECT c_custkey FROM customer))
                    AS BIGINT) AS n_violations,
               n.n_rows FROM n
        UNION ALL
        SELECT 'not_null_orderdate', 'predicate',
               CAST((SELECT count(*) FROM d WHERE o_orderdate IS NULL)
                    AS BIGINT), n.n_rows FROM n
        UNION ALL
        SELECT 'price_positive', 'predicate',
               CAST((SELECT count(*) FROM d
                     WHERE NOT COALESCE(o_totalprice > 0, FALSE))
                    AS BIGINT), n.n_rows FROM n
        UNION ALL
        SELECT 'status_accepted', 'predicate',
               CAST((SELECT count(*) FROM d
                     WHERE NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE))
                    AS BIGINT), n.n_rows FROM n
        UNION ALL
        SELECT 'unique_orderkey', 'unique',
               CAST((SELECT COALESCE(sum(c - 1), 0) FROM
                     (SELECT count(*) AS c FROM d GROUP BY o_orderkey
                      HAVING count(*) > 1))
                    AS BIGINT), n.n_rows FROM n
    ) ORDER BY rule
    """,
    rotation=False,
)
def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import expectations as E

    d = _dq_dirty_orders(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    rules = [
        E.expect("not_null_orderdate", "o_orderdate IS NOT NULL"),
        E.expect("price_positive", "o_totalprice > 0"),
        E.expect("status_accepted", "o_orderstatus IN ('O','F','P')"),
        E.expect_unique("unique_orderkey", ["o_orderkey"]),
        E.expect_foreign_key("fk_custkey", "o_custkey", cust, "c_custkey"),
    ]
    return E.check_expectations(d, rules).orderBy("rule")


@query(
    "dq_quarantine_split",
    f"""
    WITH d AS ({_DQ_DIRTY_ORDERS_SQL}),
    f AS (
        SELECT list_filter([
                   CASE WHEN NOT COALESCE(o_orderdate IS NOT NULL, FALSE)
                        THEN 'not_null_orderdate' END,
                   CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
                        THEN 'price_positive' END,
                   CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
                        THEN 'status_accepted' END
               ], x -> x IS NOT NULL) AS failed
        FROM d
    )
    SELECT CASE WHEN len(failed) = 0 THEN '<clean>'
                ELSE array_to_string(failed, ',') END AS failed_set,
           CAST(count(*) AS BIGINT) AS n
    FROM f GROUP BY 1 ORDER BY failed_set
    """,
)
def dq_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map-side gate summarized: how many rows pass clean and how
    many fall into each failure combination.  ``split_by_expectations``
    is one shared projection — at 100 TB the split costs a scan, the
    quarantined rows cost only themselves."""
    from ..operators import expectations as E

    d = _dq_dirty_orders(spark, sf_dir)
    rules = [
        E.expect("not_null_orderdate", "o_orderdate IS NOT NULL"),
        E.expect("price_positive", "o_totalprice > 0"),
        E.expect("status_accepted", "o_orderstatus IN ('O','F','P')"),
    ]
    clean, bad = E.split_by_expectations(d, rules)
    tagged = bad.select(
        F.array_join(F.col("failed_rules"), ",").alias("failed_set")
    ).unionByName(clean.select(F.lit("<clean>").alias("failed_set")))
    return (
        tagged.groupBy("failed_set")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("failed_set")
    )


@query(
    "dq_events_freshness",
    """
    WITH m AS (SELECT max(ts) AS mx FROM events),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM events)
    SELECT 'fresh_3d' AS rule, 'fresh' AS kind,
           CAST((SELECT count(*) FROM events, m
                 WHERE ts < mx - INTERVAL 3 DAY) AS BIGINT) AS n_violations,
           n.n_rows
    FROM n
    """,
)
def dq_events_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staleness vs the stream's own high-water mark: two aggregates and
    a scalar broadcast — the shape that monitors a 100 TB event table
    without a window."""
    from ..operators import expectations as E

    ev = load_table(spark, sf_dir, "events")
    return E.check_expectations(
        ev, [E.expect_fresh("fresh_3d", "ts", 3 * 24 * 3600)]
    )


@query(
    "dq_merge_gate",
    f"""
    WITH d AS ({_DQ_DIRTY_ORDERS_SQL}),
    f AS (
        SELECT *, list_filter([
                   CASE WHEN NOT COALESCE(o_orderdate IS NOT NULL, FALSE)
                        THEN 'not_null_orderdate' END,
                   CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
                        THEN 'price_positive' END,
                   CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
                        THEN 'status_accepted' END
               ], x -> x IS NOT NULL) AS failed
        FROM d
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM d)
    SELECT * FROM (
        SELECT 'merged_rows' AS kind, 'orders' AS name,
               CAST(count(*) AS BIGINT) AS n
        FROM f WHERE len(failed) = 0
        UNION ALL
        SELECT 'quarantine', array_to_string(failed, ','),
               CAST(count(*) AS BIGINT)
        FROM f WHERE len(failed) > 0 GROUP BY 2
        UNION ALL
        SELECT 'report', 'not_null_orderdate',
               CAST((SELECT count(*) FROM d WHERE o_orderdate IS NULL)
                    AS BIGINT)
        UNION ALL
        SELECT 'report', 'price_positive',
               CAST((SELECT count(*) FROM d
                     WHERE NOT COALESCE(o_totalprice > 0, FALSE)) AS BIGINT)
        UNION ALL
        SELECT 'report', 'status_accepted',
               CAST((SELECT count(*) FROM d
                     WHERE NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE))
                    AS BIGINT)
        UNION ALL
        SELECT 'report', 'unique_orderkey',
               CAST((SELECT COALESCE(sum(c - 1), 0) FROM
                     (SELECT count(*) AS c FROM d GROUP BY o_orderkey
                      HAVING count(*) > 1)) AS BIGINT)
        UNION ALL
        SELECT 'report', 'fk_custkey',
               CAST((SELECT count(*) FROM d
                     WHERE o_custkey IS NOT NULL
                       AND o_custkey NOT IN (SELECT c_custkey FROM customer))
                    AS BIGINT)
    ) ORDER BY kind, name
    """,
)
def dq_merge_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE load-path gate, end to end (VERDICT r6 prescription 1): the
    dirty-orders batch merges into a real keyed table through
    ``Table.merge(expectations=...)`` — clean rows land in the table,
    predicate-violating rows in its nested ``_quarantine`` keyed table,
    the per-rule report in ``_dq/reports.json`` — and the result
    summarizes the PERSISTED artifacts (a re-read of the table, the
    quarantine, and the report history), so the oracle differential
    proves the whole write path, not an in-memory split.

    100 TB shape: the gate adds ONE map-side projection to the merge it
    guards; quarantined rows cost only themselves (operators/
    expectations.py:gate_and_merge).
    """
    import shutil
    import tempfile

    from ..api import Engine
    from ..operators import expectations as E

    d = _dq_dirty_orders(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    rules = [
        E.expect("not_null_orderdate", "o_orderdate IS NOT NULL"),
        E.expect("price_positive", "o_totalprice > 0"),
        E.expect("status_accepted", "o_orderstatus IN ('O','F','P')"),
        E.expect_unique("unique_orderkey", ["o_orderkey"]),
        E.expect_foreign_key("fk_custkey", "o_custkey", cust, "c_custkey"),
    ]
    tmp = tempfile.mkdtemp(prefix="dq_gate_")
    try:
        t = Engine(spark).table(f"{tmp}/orders")
        t.merge(d, expectations=rules, key="o_orderkey", num_buckets=8)
        # summarize the persisted artifacts (all driver-side scalars /
        # tiny groups — the table itself never re-shuffles)
        merged = [("merged_rows", "orders", t.read().count())]
        quarantine = [
            ("quarantine", r.failed_rules, r.n)
            for r in t.quarantine()
            .groupBy("failed_rules")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        report = [
            ("report", r["rule"], r["n_violations"])
            for r in t.dq_reports()[-1]["rules"]
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        merged + quarantine + report, "kind string, name string, n long"
    ).orderBy("kind", "name")


_TS_KMV_EST = (
    "CASE WHEN n_k < 128 THEN CAST(n_k AS DOUBLE) "
    "ELSE (127.0 * 1152921504606846976.0) / CAST(kth AS DOUBLE) END"
)


@query(
    "table_sketch_facade",
    f"""
    WITH hs AS (SELECT DISTINCT
                CAST('0x' || substr(md5(o_orderstatus), 1, 15) AS BIGINT) AS h
                FROM orders),
    rs AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hs),
    ss AS (SELECT CAST(count(*) AS BIGINT) AS n_k, max(h) AS kth
           FROM rs WHERE rn <= 128),
    hc AS (SELECT DISTINCT
                CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
                     AS BIGINT) AS h
                FROM orders),
    rc AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hc),
    sc AS (SELECT CAST(count(*) AS BIGINT) AS n_k, max(h) AS kth
           FROM rc WHERE rn <= 128),
    -- bottom-k row sample of o_custkey, row identity (o_orderkey, value)
    bk AS (SELECT o_custkey AS v,
                  CAST('0x' || substr(md5(
                      CAST(o_orderkey AS VARCHAR) || chr(31)
                      || CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
           FROM orders),
    br AS (SELECT v, h, row_number() OVER (ORDER BY h, v) AS rn FROM bk),
    smp AS (SELECT v, h FROM br WHERE rn <= 256),
    sn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM smp),
    ranked AS (SELECT v, row_number() OVER (ORDER BY v, h) AS rn FROM smp)
    SELECT * FROM (
        SELECT 'distinct_est' AS kind, 'o_custkey' AS name,
               {_TS_KMV_EST} AS val FROM sc
        UNION ALL
        SELECT 'distinct_est', 'o_orderstatus', {_TS_KMV_EST} FROM ss
        UNION ALL
        SELECT 'n_sample', 'o_custkey', CAST(n AS DOUBLE) FROM sn
        UNION ALL
        SELECT 'quantile', 'p50', CAST((SELECT v FROM ranked, sn
            WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))) AS DOUBLE)
        UNION ALL
        SELECT 'quantile', 'p90', CAST((SELECT v FROM ranked, sn
            WHERE rn = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))) AS DOUBLE)
        UNION ALL
        SELECT 'quantile', 'p99', CAST((SELECT v FROM ranked, sn
            WHERE rn = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))) AS DOUBLE)
    ) ORDER BY kind, name
    """,
)
def table_sketch_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level sketch maintenance end to end (VERDICT r6
    prescription 7): orders merges into a keyed table in TWO commits,
    then ``Table.sketch``/``Table.quantiles`` answer distinct-count and
    quantile questions from the per-file sketch sidecar
    (tablesketch.py) — the oracle computes the same KMV estimates and
    bottom-k sample quantiles directly over ``orders``, so the
    differential proves the per-file decomposition (including the
    incremental second-commit refresh) exact, not just plausible.

    100 TB shape: after the k-bucket second merge only those buckets'
    new files are scanned; every later call merges ~file-count sketch
    rows and moves no data.
    """
    import shutil
    import tempfile

    from ..api import Engine

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    tmp = tempfile.mkdtemp(prefix="tsk_")
    try:
        t = Engine(spark).table(f"{tmp}/orders")
        t.merge(o.filter(F.col("o_orderkey") % 2 == 1), key="o_orderkey", num_buckets=8)
        t.merge(o.filter(F.col("o_orderkey") % 2 == 0), key="o_orderkey", num_buckets=8)
        dist = [
            ("distinct_est", r.column, float(r.distinct_est))
            for r in t.sketch(["o_custkey", "o_orderstatus"]).collect()
        ]
        q = t.quantiles(
            "o_custkey", [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
        ).collect()[0]
        rows = dist + [
            ("n_sample", "o_custkey", float(q.n_sample)),
            ("quantile", "p50", float(q.p50)),
            ("quantile", "p90", float(q.p90)),
            ("quantile", "p99", float(q.p99)),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "kind string, name string, val double"
    ).orderBy("kind", "name")


_BM25_TERMS = ["join", "hash", "vector", "scan"]
_BM25_TERMS_SQL = "', '".join(_BM25_TERMS)


@query(
    "text_bm25_topk",
    f"""
    WITH t AS (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t
           WHERE term IN ('{_BM25_TERMS_SQL}') GROUP BY doc_id, term),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    g AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS T,
                 (SELECT CAST(count(*) AS BIGINT) FROM documents) AS D),
    s AS (SELECT tf.doc_id,
                 CAST(floor(1000000.0 *
                      ln((g.D - df.df + 0.5) / (df.df + 0.5) + 1.0))
                      AS BIGINT) AS idf_micro,
                 CAST(100 * g.T * tf.tf * 22 AS DOUBLE) AS nump,
                 CAST(1000 * g.T * tf.tf
                      + 12 * (25 * g.T + 75 * dl.dl * g.D) AS DOUBLE) AS denp
          FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g)
    SELECT doc_id,
           CAST(sum(CAST(floor(CAST(idf_micro AS DOUBLE) * (nump / denp))
                    AS BIGINT)) AS BIGINT) AS bm25_micro
    FROM s GROUP BY doc_id
    ORDER BY bm25_micro DESC, doc_id LIMIT 20
    """,
    rotation=False,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed 4-term query over the documents corpus —
    the retrieval-side ranking primitive (see operators/text.py
    ``bm25_topk`` for the integer-micro exactness scheme that makes the
    ranking, not just the scores, oracle-exact)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.bm25_topk(docs, _BM25_TERMS, n=20)


@query(
    "scd2_point_in_time",
    """
    WITH v AS (
        -- closed-form validity intervals of the same three-snapshot
        -- segment history the Spark side builds by REPLAYING scd2_merge
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1992-01-01 00:00:00' AS vf,
               CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '1995-01-01 00:00:00'
                    WHEN c_custkey % 11 = 0 THEN TIMESTAMP '1997-01-01 00:00:00'
               END AS vt
        FROM customer
        UNION ALL
        SELECT c_custkey, 'SEG7', TIMESTAMP '1995-01-01 00:00:00',
               CASE WHEN c_custkey % 11 = 0
                    THEN TIMESTAMP '1997-01-01 00:00:00' END
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, 'SEG11', TIMESTAMP '1997-01-01 00:00:00', NULL
        FROM customer WHERE c_custkey % 11 = 0
    )
    SELECT v.segment, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN v ON o.o_custkey = v.c_custkey
     AND o.o_orderdate >= v.vf
     AND (v.vt IS NULL OR o.o_orderdate < v.vt)
    GROUP BY v.segment ORDER BY v.segment
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history + point-in-time fact join, end to end: three
    customer-segment snapshots replay through ``scd2_init``/``scd2_merge``
    (operators/scd.py — the anti-join+union MERGE emulation), then every
    order joins the dimension VERSION that was valid on its order date
    (``valid_from <= ts < valid_to``).  The oracle computes the same
    history in closed form, so the differential proves the merge's
    interval chaining — closes, opens, multi-change keys (7·11 = both
    transitions) — not just row counts.

    100 TB shape: the PIT join is an equi-join on the key with a
    residual interval predicate — dimension-sized right side broadcasts;
    the history itself rewrites only its is_current slice per merge
    (scd.py module doc)."""
    from ..operators.scd import scd2_init, scd2_merge

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )

    def snap(ts: str, seg: F.Column) -> DataFrame:
        return cust.select(
            "c_custkey",
            seg.alias("segment"),
            F.lit(ts).cast("timestamp").alias("uploadDate"),
        )

    seg7 = F.when(F.col("c_custkey") % 7 == 0, F.lit("SEG7")).otherwise(
        F.col("segment")
    )
    seg11 = F.when(F.col("c_custkey") % 11 == 0, F.lit("SEG11")).otherwise(seg7)
    hist = scd2_init(snap("1992-01-01 00:00:00", F.col("segment")))
    hist = scd2_merge(
        hist, snap("1995-01-01 00:00:00", seg7), "c_custkey", ["segment"]
    )
    hist = scd2_merge(
        hist, snap("1997-01-01 00:00:00", seg11), "c_custkey", ["segment"]
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    pit = o.join(
        F.broadcast(hist),
        (o.o_custkey == hist.c_custkey)
        & (o.o_orderdate >= hist.valid_from)
        & (hist.valid_to.isNull() | (o.o_orderdate < hist.valid_to)),
    )
    return (
        pit.groupBy("segment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("segment")
    )


@query(
    "dml_merge_into",
    """
    WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
                  WHERE o_orderkey % 3 <> 0),
    src AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
            WHERE o_orderkey % 5 = 0),
    final AS (
        SELECT k, CASE WHEN k % 5 = 0 AND k % 10 <> 0 THEN p + 1000.0
                       ELSE p END AS p
        FROM base WHERE k % 10 <> 0
        UNION ALL
        SELECT k, p FROM src WHERE k % 3 = 0
    )
    SELECT * FROM (
        SELECT 'counts' AS kind, 'deleted' AS name,
               CAST((SELECT count(*) FROM base WHERE k % 10 = 0) AS DOUBLE) AS val
        UNION ALL
        SELECT 'counts', 'inserted',
               CAST((SELECT count(*) FROM src WHERE k % 3 = 0) AS DOUBLE)
        UNION ALL
        SELECT 'counts', 'updated',
               CAST((SELECT count(*) FROM base
                     WHERE k % 5 = 0 AND k % 10 <> 0) AS DOUBLE)
        UNION ALL
        SELECT 'final', 'n_rows', CAST((SELECT count(*) FROM final) AS DOUBLE)
        UNION ALL
        SELECT 'final', 'sum_p', (SELECT round(sum(p), 2) FROM final)
    ) ORDER BY kind, name
    """,
)
def dml_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE INTO, end to end (sink.merge_into): a base
    keyed table absorbs one CDC batch — matched keys update
    (``p + 1000``) or delete (``s_op = 'D'``), unmatched source keys
    insert — in ONE MOR delta commit, and the result summarizes the
    re-read table plus the merge's action counts.  The oracle computes
    the same final state in closed form, so the differential pins all
    three clauses' row-level semantics at once.

    100 TB shape: source keys prune to their buckets, the write is
    O(affected keys + inserts) delta rows, and precedence/compaction/
    CDF are the existing MOR machinery — see sink.merge_into."""
    import shutil
    import tempfile

    from ..api import Engine

    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("p")
    )
    src = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.col("o_totalprice").alias("p"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    tmp = tempfile.mkdtemp(prefix="mi_")
    try:
        t = Engine(spark).table(f"{tmp}/t")
        t.merge(base, key="o_orderkey", num_buckets=8)
        res = t.merge_into(
            src,
            when_matched_update={"p": "p + 1000.0"},
            when_matched_delete="s_op = 'D'",
        )
        final = t.read().agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("p"), 2).alias("s")
        ).collect()[0]
        rows = [
            ("counts", "deleted", float(res["deleted"])),
            ("counts", "inserted", float(res["inserted"])),
            ("counts", "updated", float(res["updated"])),
            ("final", "n_rows", float(final.n)),
            ("final", "sum_p", float(final.s)),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "kind string, name string, val double"
    ).orderBy("kind", "name")


@query(
    "cdc_apply_changes",
    """
    WITH k AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
    fin AS (SELECT k, CASE WHEN k % 5 = 0 THEN p + 1000.0 ELSE p END AS v
            FROM k
            WHERE (k % 3 <> 0 OR k % 5 = 0)
              AND NOT (k % 7 = 0 AND k % 5 <> 0))
    SELECT * FROM (
        SELECT 'apply1' AS kind, 'upserted' AS name,
               CAST((SELECT count(*) FROM k
                     WHERE k % 3 <> 0 OR k % 5 = 0) AS DOUBLE) AS val
        UNION ALL
        SELECT 'apply2', 'deleted',
               CAST((SELECT count(*) FROM k
                     WHERE k % 7 = 0 AND k % 5 <> 0) AS DOUBLE)
        UNION ALL
        SELECT 'apply2', 'ignored',
               CAST((SELECT count(*) FROM k
                     WHERE k % 7 = 0 AND k % 5 = 0) AS DOUBLE)
        UNION ALL
        SELECT 'apply3', 'ignored',
               CAST((SELECT count(*) FROM k WHERE k % 7 = 0) AS DOUBLE)
        UNION ALL
        SELECT 'final', 'n_rows', CAST((SELECT count(*) FROM fin) AS DOUBLE)
        UNION ALL
        SELECT 'final', 'sum_v', (SELECT round(sum(v), 2) FROM fin)
    ) ORDER BY kind, name
    """,
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLT-style APPLY CHANGES INTO, end to end (sink.apply_changes):
    an out-of-order CDC feed — inserts at seq 1 and updates at seq 3
    land FIRST (net-resolved in one batch), the seq-2 deletes arrive
    LATE, and the delete batch is then redelivered whole.  The oracle's
    closed form pins all of it: late deletes lose to the newer stored
    sequence, deletes of never-inserted keys still record sequenced
    tombstone memory, and the redelivered batch is a 100%-ignored no-op
    (the idempotence that makes at-least-once streaming delivery
    effectively-once — streaming/cdc_stream.py).

    100 TB shape: per batch, one window over the batch for net-change
    resolution, a bucket-pruned stored-sequence probe over only the
    batch keys' buckets, one O(net-change) MOR delta commit; the table
    is never scanned (see sink.apply_changes)."""
    import shutil
    import tempfile

    from .. import sink

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    ins = o.filter(F.col("k") % 3 != 0).select(
        "k", F.lit(1).alias("seq"), F.lit("U").alias("op"),
        F.col("p").alias("v"),
    )
    upd = o.filter(F.col("k") % 5 == 0).select(
        "k", F.lit(3).alias("seq"), F.lit("U").alias("op"),
        (F.col("p") + 1000.0).alias("v"),
    )
    dels = o.filter(F.col("k") % 7 == 0).select(
        "k", F.lit(2).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("v"),
    )
    tmp = tempfile.mkdtemp(prefix="cdc_")
    try:
        tgt = f"{tmp}/t"
        r1 = sink.apply_changes(
            spark, tgt, ins.unionByName(upd), "seq", key="k", num_buckets=8
        )
        r2 = sink.apply_changes(spark, tgt, dels, "seq")
        r3 = sink.apply_changes(spark, tgt, dels, "seq")  # redelivery
        fin = sink.read_keyed_table(spark, tgt).agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("s")
        ).collect()[0]
        rows = [
            ("apply1", "upserted", float(r1["upserted"])),
            ("apply2", "deleted", float(r2["deleted"])),
            ("apply2", "ignored", float(r2["ignored"])),
            ("apply3", "ignored", float(r3["ignored"])),
            ("final", "n_rows", float(fin.n)),
            ("final", "sum_v", float(fin.s)),
        ]
        assert r3 == {"upserted": 0, "deleted": 0, "ignored": r3["ignored"]}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "kind string, name string, val double"
    ).orderBy("kind", "name")


_SCD2_CLOSURE_SQL = """
    WITH ch AS (
        SELECT o_custkey AS k, o_orderkey AS seq, o_orderstatus AS v,
               (o_orderkey % 13 = 0) AS del
        FROM orders
    ),
    m AS (
        SELECT k, seq, v, del,
               lag(del) OVER w AS pdel,
               lag(v) OVER w AS pv
        FROM ch WINDOW w AS (PARTITION BY k ORDER BY seq)
    ),
    kept AS (
        SELECT * FROM m
        WHERE pdel IS NULL OR del <> pdel
           OR (NOT del AND NOT pdel AND (v IS DISTINCT FROM pv))
    ),
    iv AS (
        SELECT k, seq, v, del,
               lead(seq) OVER (PARTITION BY k ORDER BY seq) AS valid_to
        FROM kept
    )
    SELECT k AS o_custkey, v AS status,
           seq AS valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM iv WHERE NOT del
"""


@query("cdc_scd2_table", _SCD2_CLOSURE_SQL)
def cdc_scd2_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAINTAINED SCD2 table (sink.apply_changes_scd2): the same
    orders change feed as cdc_scd2_history, but split into two ordered
    micro-batches applied incrementally to a keyed history table —
    closed intervals pass through untouched, each key's open tail
    replays through the one-pass builder, state-identical tails skip
    their commit.  The oracle is the SAME recursive closure as the
    one-shot builder's, so the differential proves incremental ==
    one-shot over the whole table (the DLT STORED AS SCD TYPE 2
    contract).

    100 TB shape: per batch, only the batch keys' buckets read, one
    replace-by-key MOR commit for keys whose tail changed (see
    sink.apply_changes_scd2)."""
    import shutil
    import tempfile

    from .. import sink

    ch = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("o_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderstatus").alias("status"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    mid = ch.agg(F.max("seq")).collect()[0][0] // 2
    tmp = tempfile.mkdtemp(prefix="scd2t_")
    try:
        tgt = f"{tmp}/h"
        sink.apply_changes_scd2(
            spark, tgt, ch.filter(F.col("seq") <= mid), "seq", ["status"],
            key="o_custkey", num_buckets=8,
        )
        sink.apply_changes_scd2(
            spark, tgt, ch.filter(F.col("seq") > mid), "seq", ["status"]
        )
        out = (
            sink.read_keyed_table(spark, tgt)
            .select(
                "o_custkey", "status", "valid_from", "valid_to", "is_current"
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query(
    "cdc_scd2_history",
    """
    WITH ch AS (
        SELECT o_custkey AS k, o_orderkey AS seq, o_orderstatus AS v,
               (o_orderkey % 13 = 0) AS del
        FROM orders
    ),
    m AS (
        SELECT k, seq, v, del,
               lag(del) OVER w AS pdel,
               lag(v) OVER w AS pv
        FROM ch WINDOW w AS (PARTITION BY k ORDER BY seq)
    ),
    kept AS (
        SELECT * FROM m
        WHERE pdel IS NULL OR del <> pdel
           OR (NOT del AND NOT pdel AND (v IS DISTINCT FROM pv))
    ),
    iv AS (
        SELECT k, seq, v, del,
               lead(seq) OVER (PARTITION BY k ORDER BY seq) AS valid_to
        FROM kept
    )
    SELECT k AS o_custkey, v AS status,
           seq AS valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM iv WHERE NOT del
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES ... STORED AS SCD TYPE 2: a full dimension history
    built from a CDC feed in ONE pass (operators/scd.scd2_from_changes).
    The feed is each customer's order-status changes sequenced by order
    key, with every 13th order a delete — so the differential covers
    interval chaining, redundant-change suppression (same status again),
    delete-closes-interval, and reopen-after-delete, per key, over the
    whole table.

    100 TB shape: ONE shuffle (window by key ordered by sequence); no
    join against any history table — the history IS the output."""
    from ..operators.scd import scd2_from_changes

    ch = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("o_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderstatus").alias("status"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    hist = scd2_from_changes(ch, "o_custkey", "seq", ["status"], op_col="op")
    return hist.select(
        "o_custkey", "status",
        F.col("valid_from"), F.col("valid_to"), F.col("is_current"),
    )


@query(
    "er_fuzzy_match",
    """
    WITH p AS (SELECT p_partkey, p_name, p_brand, p_size FROM part),
    d AS (
        SELECT p_partkey AS d_id,
               concat(substr(p_name, 1, CAST(p_partkey % (length(p_name) - 2) + 2 AS INTEGER) - 1),
                      substr(p_name, CAST(p_partkey % (length(p_name) - 2) + 2 AS INTEGER) + 1)) AS d_name,
               p_brand, p_size
        FROM p WHERE p_partkey % 3 = 0
    ),
    cand AS (
        SELECT d.d_id, d.d_name, p.p_partkey, p.p_name,
               levenshtein(d.d_name, p.p_name) AS dist
        FROM d JOIN p USING (p_brand, p_size)
    ),
    best AS (
        SELECT d_id, p_partkey AS matched_key, dist,
               row_number() OVER (PARTITION BY d_id
                                  ORDER BY dist, p_partkey) AS rk
        FROM cand WHERE dist <= 2
    )
    SELECT d_id, matched_key, CAST(dist AS INTEGER) AS dist
    FROM best WHERE rk = 1
    """,
)
def er_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked fuzzy matching (operators/linkage):
    every third part arrives as a dirty record — one character deleted
    at a key-derived position — and links back to the master part table
    by blocking on (brand, container) equality, then Levenshtein <= 2
    within the block, best candidate per record (min distance,
    deterministic tiebreak).  Character-level linkage is the primitive
    the token/shingle dedup family can't express (a one-char typo
    changes nothing in 3-gram Jaccard on words, everything in edit
    distance).

    100 TB shape: candidate generation is ONE equi-join on the blocking
    key (never a cross join), the comparator is a codegen'd JVM
    expression per pair, and the top-1 window repartitions by incoming
    record id — linear in candidate pairs, which the blocking-key
    distribution bounds (see er_block_stats)."""
    from ..operators.linkage import best_links, candidate_pairs

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    pos = (F.col("p_partkey") % (F.length("p_name") - 2) + 2).cast("int")
    dirty = (
        p.filter(F.col("p_partkey") % 3 == 0)
        .withColumn("__pos", pos)
        .select(
            F.col("p_partkey").alias("d_id"),
            F.concat(
                F.expr("substring(p_name, 1, __pos - 1)"),
                F.expr("substring(p_name, __pos + 1, 100000)"),
            ).alias("d_name"),
            "p_brand",
            "p_size",
        )
    )
    cand = candidate_pairs(dirty, p, ["p_brand", "p_size"])
    links = best_links(
        cand, "d_id", "d_name", "p_name", max_dist=2, tiebreak_col="p_partkey"
    )
    return links.select(
        "d_id",
        F.col("p_partkey").alias("matched_key"),
        F.col("dist").cast("int").alias("dist"),
    )


@query(
    "er_block_stats",
    """
    WITH s AS (
        SELECT p_brand, p_size, count(*) AS block_size
        FROM part GROUP BY 1, 2
    )
    SELECT block_size, CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(block_size * block_size) AS BIGINT) AS pairs
    FROM s GROUP BY block_size
    """,
    rotation=False,
)
def er_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-key size distribution for the ER join (operators/
    linkage.block_stats) — the governing number for blocked matching at
    scale: ``pairs`` (size²) is each block's join cost, and one
    mega-block (NULL/default attribute values in real data) is the
    difference between linear and quadratic.  Production path caps
    blocks via candidate_pairs(max_block=...) and re-blocks the
    residual finer."""
    from ..operators.linkage import block_stats

    p = load_table(spark, sf_dir, "part")
    return block_stats(p, ["p_brand", "p_size"]).select(
        "block_size",
        F.col("n_blocks").cast("long"),
        F.col("pairs").cast("long"),
    )


@query(
    "q_market_basket",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
    n AS (SELECT p, count(*) AS np FROM b GROUP BY p),
    tot AS (SELECT count(DISTINCT k) AS orders FROM b),
    pr AS (
        SELECT a.p AS p1, c.p AS p2, count(*) AS support
        FROM b a JOIN b c USING (k) WHERE a.p < c.p
        GROUP BY 1, 2
    )
    SELECT p1, p2, CAST(support AS BIGINT) AS support,
           CAST((support * orders * 1000000)
                // (n1.np * n2.np) AS BIGINT) AS lift_ppm
    FROM pr
    JOIN n n1 ON pr.p1 = n1.p
    JOIN n n2 ON pr.p2 = n2.p
    CROSS JOIN tot
    ORDER BY support DESC, p1, p2 LIMIT 20
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: top co-purchased part pairs
    by support, with integer-exact lift (support·N·10^6 // (n_a·n_b) —
    floor division so both engines agree bit-for-bit).  The A-priori
    support-counting core: one distinct (basket, item) projection, one
    self-join per basket, one pair aggregate.

    100 TB shape: the self-join shuffles on the basket key and fan-out
    is C(items-per-basket, 2) — bounded by basket size (~7 for
    lineitem), NOT by catalog size; item counts broadcast back onto the
    top-k.  The support>=2 edge set this induces feeds graph_triangles."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    n = b.groupBy("p").agg(F.count(F.lit(1)).alias("np"))
    orders = b.agg(F.countDistinct("k").alias("orders"))
    b2 = b.select("k", F.col("p").alias("p2"))
    pr = (
        b.join(b2, "k")
        .filter(F.col("p") < F.col("p2"))
        .groupBy(F.col("p").alias("p1"), F.col("p2"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    out = (
        pr.join(F.broadcast(n.withColumnRenamed("p", "p1").withColumnRenamed("np", "n1")), "p1")
        .join(F.broadcast(n.withColumnRenamed("p", "p2").withColumnRenamed("np", "n2")), "p2")
        .crossJoin(F.broadcast(orders))
        .select(
            "p1",
            "p2",
            F.col("support").cast("long"),
            # integer floor-division on both engines (Spark `div`,
            # DuckDB `//`) — a double division here can floor to the
            # wrong side at near-integer quotients
            F.expr(
                "CAST(support * orders * 1000000 AS BIGINT)"
                " div (n1 * n2)"
            ).alias("lift_ppm"),
        )
    )
    return out.orderBy(F.desc("support"), "p1", "p2").limit(20)


@query(
    "graph_triangles",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
    pr AS (
        SELECT a.p AS u, c.p AS v
        FROM b a JOIN b c USING (k) WHERE a.p < c.p
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
        SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT u AS n FROM pr UNION ALL SELECT v FROM pr
        ) GROUP BY n
    ),
    rk AS (SELECT n, d * 1000000000 + n AS r FROM deg),
    o AS (
        SELECT CASE WHEN ru.r < rv.r THEN pr.u ELSE pr.v END AS a,
               CASE WHEN ru.r < rv.r THEN pr.v ELSE pr.u END AS b,
               CASE WHEN ru.r < rv.r THEN rv.r ELSE ru.r END AS rb
        FROM pr JOIN rk ru ON pr.u = ru.n JOIN rk rv ON pr.v = rv.n
    ),
    tri AS (
        SELECT e1.a AS a, e1.b AS x, e2.b AS y
        FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.rb < e2.rb
        JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT x FROM tri
        UNION ALL SELECT y FROM tri
    ) GROUP BY node
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.triangle_counts) on the
    co-purchase graph — part pairs co-purchased in >= 2 orders.  The
    degree-orientation algorithm: orient each edge toward its
    higher-(degree, id) endpoint, enumerate wedges from the oriented
    list, close them against it (Suri & Vassilvitskii WWW'11).

    100 TB shape: orientation caps per-node wedge fan-out at
    O(sqrt(|E|)) regardless of degree skew — the celebrity-node join
    that melts the naive formulation spreads across its higher-rank
    neighbors; everything is equi-joins on node keys, rank compare is
    one codegen'd bigint."""
    from ..operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    b2 = b.select("k", F.col("p").alias("p2"))
    edges = (
        b.join(b2, "k")
        .filter(F.col("p") < F.col("p2"))
        .groupBy(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .drop("c")
    )
    return triangle_counts(edges).select(
        "node", F.col("n_triangles").cast("long")
    )


@query(
    "source_zip_roundtrip",
    """
    SELECT concat('m', CAST(event_id % 3 AS VARCHAR), '.csv') AS fileName,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(length(props)) AS BIGINT) AS props_chars,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events WHERE event_id % 17 = 0
    GROUP BY 1
    """,
)
def source_zip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed zip-of-CSVs DataSource, end to end
    (sources/zip_datasource — PySpark 4 Python DataSource API): an
    events subset round-trips through RFC-4180 CSV members inside two
    zip archives, is read back by `format("zipcsv")` with one input
    partition per member (executor-side decompression — the reference's
    driver-side unpack script, initial-script/extract-zip.py, never
    materializes extracted files here), and per-member aggregates must
    reproduce the closed form over the original table.  ``props`` (JSON
    with embedded quotes/commas) rides along so the differential pins
    quoting fidelity through the whole write→zip→scan chain, not just
    row counts.

    100 TB shape: the driver touches only zip central directories
    (O(members) metadata); each member decompresses and Arrow-batches on
    an executor; lineage is stamped in-source (input_file_name is
    undefined in a custom source)."""
    import os
    import shutil
    import tempfile
    import zipfile

    from ..sources.zip_datasource import read_zip_csv

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 17 == 0)
        .select("event_id", "props")
    )
    pdf = ev.toPandas()
    tmp = tempfile.mkdtemp(prefix="zipsrc_")
    try:
        groups = {m: g for m, g in pdf.groupby(pdf["event_id"] % 3)}
        with zipfile.ZipFile(os.path.join(tmp, "a.zip"), "w") as zf:
            for m in (0, 1):
                if m in groups:
                    zf.writestr(
                        f"m{m}.csv", groups[m].to_csv(index=False)
                    )
        with zipfile.ZipFile(os.path.join(tmp, "b.zip"), "w") as zf:
            if 2 in groups:
                zf.writestr("m2.csv", groups[2].to_csv(index=False))
        back = read_zip_csv(spark, tmp, ["event_id", "props"])
        out = (
            back.groupBy("fileName")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.length("props")).cast("long").alias("props_chars"),
                F.min(F.col("event_id").cast("long")).alias("min_id"),
                F.max(F.col("event_id").cast("long")).alias("max_id"),
            )
            .localCheckpoint(eager=True)  # materialize before tmp cleanup
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query(
    "q_interpolate_linear",
    """
    WITH h0 AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS DOUBLE) AS n
        FROM events GROUP BY 1, 2
    ),
    h AS (
        SELECT event_type, h,
               CASE WHEN (CAST(epoch(h) AS BIGINT) // 3600) % 5 = 2
                    THEN NULL ELSE n END AS v
        FROM h0
    ),
    bounds AS (SELECT event_type, min(h) AS mn, max(h) AS mx
               FROM h GROUP BY 1),
    spine AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    j AS (
        SELECT s.event_type, s.h, hh.v
        FROM spine s LEFT JOIN h hh
          ON s.event_type = hh.event_type AND s.h = hh.h
    ),
    m AS (
        SELECT event_type, h, v,
               CAST(epoch(h) AS BIGINT) // 3600 AS hh,
               last_value(v IGNORE NULLS) OVER w1 AS pv,
               last_value(CASE WHEN v IS NOT NULL
                               THEN CAST(epoch(h) AS BIGINT) // 3600 END
                          IGNORE NULLS) OVER w1 AS ph,
               first_value(v IGNORE NULLS) OVER w2 AS nv,
               first_value(CASE WHEN v IS NOT NULL
                                THEN CAST(epoch(h) AS BIGINT) // 3600 END
                           IGNORE NULLS) OVER w2 AS nh
        FROM j
        WINDOW w1 AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h AS hour,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + (nv - pv) * (hh - ph) / (nh - ph) END
               AS value_filled,
           CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
    FROM m
    WHERE v IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
    """,
    rotation=False,
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series LINEAR interpolation (TimescaleDB's
    ``time_bucket_gapfill + interpolate``, the companion to
    q_gap_fill_hourly's LOCF): per event type, hourly event counts on a
    dense spine, with every 5th hour "dropped" to simulate sensor
    outage; missing hours take the straight line between the nearest
    observation on each side — hours before the first / after the last
    observation stay absent (no extrapolation).  Counts are exact
    integers, so the interpolation arithmetic is identical IEEE double
    math on both engines — no rounding anywhere in the differential.

    100 TB shape: one hour-grain aggregate, a per-series spine explode,
    and two frame windows PARTITIONED BY the series key — series
    parallelize across the cluster; a single pathologically long series
    would use the per-day carry decomposition documented at
    q_gap_fill_hourly."""
    ev = load_table(spark, sf_dir, "events")
    h0 = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    hh_of = lambda c: F.expr(f"unix_timestamp({c}) div 3600")  # noqa: E731
    h = h0.withColumn(
        "v",
        F.when(hh_of("h") % 5 == 2, F.lit(None).cast("double")).otherwise(
            F.col("n")
        ),
    ).drop("n")
    bounds = h.groupBy("event_type").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    j = spine.join(h, ["event_type", "h"], "left")
    w1 = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hh = F.when(F.col("v").isNotNull(), hh_of("h"))
    m = (
        j.withColumn("hh", hh_of("h"))
        .withColumn("pv", F.last("v", ignorenulls=True).over(w1))
        .withColumn("ph", F.last(obs_hh, ignorenulls=True).over(w1))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w2))
        .withColumn("nh", F.first(obs_hh, ignorenulls=True).over(w2))
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.col("hh") - F.col("ph")
    ) / (F.col("nh") - F.col("ph"))
    return m.filter(
        F.col("v").isNotNull()
        | (F.col("pv").isNotNull() & F.col("nv").isNotNull())
    ).select(
        "event_type",
        F.col("h").alias("hour"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(interp)
        .alias("value_filled"),
        F.when(F.col("v").isNotNull(), F.lit("obs"))
        .otherwise(F.lit("interp"))
        .alias("src"),
    )


@query(
    "graph_hierarchy_closure",
    """
    WITH RECURSIVE e AS (
        SELECT c.o_orderkey AS child, p.o_orderkey AS parent
        FROM orders c JOIN orders p ON c.o_orderkey // 10 = p.o_orderkey
        WHERE c.o_orderkey // 10 <> c.o_orderkey
    ),
    cl AS (
        SELECT o.o_orderkey AS node, o.o_orderkey AS root, 0 AS depth
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.child = o.o_orderkey)
        UNION ALL
        SELECT e.child, cl.root, cl.depth + 1
        FROM e JOIN cl ON e.parent = cl.node
    )
    SELECT node, root, CAST(depth AS INTEGER) AS depth FROM cl
    """,
)
def graph_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE parity: Spark SQL has no ``WITH RECURSIVE``, so the
    hierarchy closure (root + depth per node) runs as pointer DOUBLING
    (operators/graph.tree_ancestors — ceil(log2 depth) rounds, each one
    node-sized self-join), here over the synthetic orders forest
    (parent = orderkey/10 when that key exists).  The oracle IS a
    genuine recursive CTE, so the differential proves the doubling's
    closure — EVERY node's root and exact depth — against the textbook
    sequential semantics, row for row.

    100 TB shape: D-deep hierarchies cost log2(D) shuffles of the
    node-sized state (a 2^25 chain = 25 rounds), never D sequential
    joins; the edge set is read once."""
    from ..operators.graph import tree_ancestors

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    keys = o.select(F.col("k").alias("pk"))
    edges = (
        o.select("k", F.expr("k div 10").alias("pk"))
        .filter(F.col("k") != F.col("pk"))
        .join(keys, "pk")
        .select(F.col("k").alias("child"), F.col("pk").alias("parent"))
    )
    closure = tree_ancestors(edges, "child", "parent")
    return o.join(closure, o["k"] == closure["node"], "left").select(
        F.col("k").alias("node"),
        F.coalesce(closure["root"], o["k"]).alias("root"),
        F.coalesce(closure["depth"], F.lit(0)).cast("int").alias("depth"),
    )


@query(
    "q_feature_binning",
    """
    WITH b AS (
        SELECT o_orderpriority,
               ntile(10) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS bin,
               o_totalprice AS p
        FROM orders
    )
    SELECT o_orderpriority, CAST(bin AS INTEGER) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           min(p) AS lo, max(p) AS hi,
           round(sum(p), 2) AS sum_p
    FROM b GROUP BY 1, 2
    """,
)
def q_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-depth (quantile) feature binning — the discretization
    primitive for feature engineering: NTILE deciles of order value
    WITHIN each priority class (deterministic: value + key tiebreak),
    then per-bin population, bounds and mass.  min/max are raw column
    values (never rounded — order-independent); only the sum rounds.

    100 TB shape: the rank window PARTITIONS BY the grouping class, so
    bins compute per-partition in parallel — the global-sort variant of
    equal-depth binning is the anti-pattern; for a single giant series
    use sketch_sample_quantiles' mergeable bottom-k to fix boundaries,
    then bin map-side."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    b = o.select(
        "o_orderpriority",
        F.ntile(10).over(w).cast("int").alias("bin"),
        F.col("o_totalprice").alias("p"),
    )
    return b.groupBy("o_orderpriority", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("p").alias("lo"),
        F.max("p").alias("hi"),
        F.round(F.sum("p"), 2).alias("sum_p"),
    )


@query(
    "q_linear_regression",
    """
    WITH x0 AS (
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hh,
               value AS y
        FROM events
    ),
    c AS (SELECT event_type, min(hh) AS h0 FROM x0 GROUP BY 1),
    d AS (
        SELECT x0.event_type,
               CAST(x0.hh - c.h0 AS DOUBLE) AS x, y
        FROM x0 JOIN c ON x0.event_type = c.event_type
    ),
    s AS (
        SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM d GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept
    FROM s
    """,
)
def q_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS per group (the `regr_slope`/`regr_intercept`
    analytics surface): event value regressed on hours-since-first-
    observation, per event type, from ONE pass of five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) — the map-reducible formulation
    that needs no iterative solver and no global sort.  x is centered on
    the group's first hour so the normal-equation differences don't
    catastrophically cancel at epoch magnitudes; sums round (engine
    accumulation order), the shared slope subtree is written identically
    in both engines.

    100 TB shape: one keyed aggregate; sufficient statistics are 5
    doubles per group and merge associatively (the same law streaming or
    partial aggregation uses)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias("hh"),
        F.col("value").alias("y"),
    )
    c = ev.groupBy("event_type").agg(F.min("hh").alias("h0"))
    d = ev.join(F.broadcast(c), "event_type").select(
        "event_type",
        (F.col("hh") - F.col("h0")).cast("double").alias("x"),
        "y",
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    )


@query(
    "table_partition_replay",
    """
    WITH base AS (
        SELECT o_orderpriority AS pr, o_orderkey AS k, o_totalprice AS p
        FROM orders
    ),
    final AS (
        SELECT pr, k, p FROM base WHERE pr <> '3-MEDIUM'
        UNION ALL
        SELECT pr, k, p + 1000.0 FROM base
        WHERE pr = '3-MEDIUM' AND k % 2 = 0
    )
    SELECT pr, CAST(count(*) AS BIGINT) AS n, round(sum(p), 2) AS sum_p
    FROM final GROUP BY pr
    """,
)
def table_partition_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite end to end
    (sources/warehouse.overwrite_partitions — `INSERT OVERWRITE ...
    PARTITION` semantics): orders land partitioned by priority, then ONE
    priority is replayed with corrected rows (even keys only, +1000);
    the re-read per-partition aggregate must show exactly that partition
    replaced and every other untouched — which the oracle's closed form
    pins.  The replayed write never lists, reads, or rewrites the other
    partitions (write cost O(replaced partition) — the daily-replay
    primitive at a 3,650-day fact table).

    Readers filtering on the partition column prune at plan time
    (PartitionFilters — gated in tests/test_partitioned.py)."""
    import shutil
    import tempfile

    from ..sources.warehouse import overwrite_partitions, read_partitioned

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
    )
    tmp = tempfile.mkdtemp(prefix="pr_")
    try:
        path = f"{tmp}/fact"
        overwrite_partitions(o, path, ["pr"])
        replay = o.filter(
            (F.col("pr") == "3-MEDIUM") & (F.col("k") % 2 == 0)
        ).withColumn("p", F.col("p") + 1000.0)
        overwrite_partitions(replay, path, ["pr"])
        out = (
            read_partitioned(spark, path)
            .groupBy("pr")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.round(F.sum("p"), 2).alias("sum_p"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query(
    "q_chi_square",
    """
    WITH c AS (
        SELECT event_type, CAST(user_id % 4 AS INTEGER) AS seg,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
    s AS (SELECT seg, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
    g AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c)
    SELECT c.event_type, c.seg, c.o,
           (r.rt * s.ct) / g.n AS expected,
           (c.o - (r.rt * s.ct) / g.n)
             * (c.o - (r.rt * s.ct) / g.n)
             / ((r.rt * s.ct) / g.n) AS contrib
    FROM c
    JOIN r ON c.event_type = r.event_type
    JOIN s ON c.seg = s.seg
    CROSS JOIN g
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency analysis (independence of event type ×
    user segment) — the statistical-testing primitive behind drift
    monitors and categorical feature selection: observed cell counts,
    expected counts under independence (row·col/n), and each cell's
    chi-square contribution.  Every number derives from exact integer
    counts through identically-structured double arithmetic (row·col <
    2^53, division deterministic IEEE), so the differential needs NO
    rounding — both engines agree to the last bit.

    100 TB shape: one cell aggregate over the fact table; row/column/
    grand totals are category-sized and broadcast back onto the cells —
    the corpus shuffles once."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", (F.col("user_id") % 4).cast("int").alias("seg")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    c = c.localCheckpoint(eager=True)  # totals + cells share one scan
    r = c.groupBy("event_type").agg(F.sum("o").cast("long").alias("rt"))
    s = c.groupBy("seg").agg(F.sum("o").cast("long").alias("ct"))
    g = c.agg(F.sum("o").cast("long").alias("n"))
    e = (F.col("rt") * F.col("ct")) / F.col("n")
    return (
        c.join(F.broadcast(r), "event_type")
        .join(F.broadcast(s), "seg")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "seg",
            "o",
            e.alias("expected"),
            ((F.col("o") - e) * (F.col("o") - e) / e).alias("contrib"),
        )
    )


@query(
    "q_winsorize",
    """
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY 1
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.value < q.p05 OR e.value > q.p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           round(q.p05, 6) AS p05, round(q.p95, 6) AS p95,
           round(avg(CASE WHEN e.value < q.p05 THEN q.p05
                          WHEN e.value > q.p95 THEN q.p95
                          ELSE e.value END), 6) AS winsorized_mean,
           round(avg(e.value), 6) AS raw_mean
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type, q.p05, q.p95
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the outlier-robust cleaning primitive: per event
    type, clip values to the [p5, p95] band and report the clipped
    count plus winsorized vs raw mean.  Percentiles are interpolated
    (rounded per the rule, as are the means); the clip itself is a CASE
    chain over the broadcast per-group bounds.

    100 TB shape: one percentile aggregate (group-sized state), bounds
    broadcast back onto the fact scan, one final aggregate — the corpus
    shuffles once and the clip is map-side."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    clipped = (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))
    wins = (
        F.when(F.col("value") < F.col("p05"), F.col("p05"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
    )
    return j.groupBy("event_type", "p05", "p95").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(clipped.cast("long")).alias("n_clipped"),
        F.round(F.avg(wins), 6).alias("winsorized_mean"),
        F.round(F.avg("value"), 6).alias("raw_mean"),
    ).select(
        "event_type", "n", "n_clipped",
        F.round("p05", 6).alias("p05"), F.round("p95", 6).alias("p95"),
        "winsorized_mean", "raw_mean",
    )


@query(
    "q_recommendations",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
    n AS (SELECT p, count(*) AS np FROM b GROUP BY p),
    tot AS (SELECT count(DISTINCT k) AS orders FROM b),
    pr AS (
        SELECT a.p AS p1, c.p AS p2, count(*) AS support
        FROM b a JOIN b c USING (k) WHERE a.p <> c.p
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    scored AS (
        SELECT p1, p2, CAST(support AS BIGINT) AS support,
               CAST((support * orders * 1000000)
                    // (n1.np * n2.np) AS BIGINT) AS lift_ppm
        FROM pr
        JOIN n n1 ON pr.p1 = n1.p
        JOIN n n2 ON pr.p2 = n2.p
        CROSS JOIN tot
    ),
    rk AS (
        SELECT *, row_number() OVER (PARTITION BY p1
                                     ORDER BY lift_ppm DESC, support DESC,
                                              p2) AS rnk
        FROM scored
    )
    SELECT p1 AS part, p2 AS recommended, support, lift_ppm,
           CAST(rnk AS INTEGER) AS rnk
    FROM rk WHERE rnk <= 3
    """,
)
def q_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item recommendations from co-purchase lift — the
    Amazon-style "customers also bought" stage on top of the
    market-basket support core: directed pairs at support >= 2, scored
    by integer-exact lift, top-3 per part by (lift, support,
    deterministic id).  The whole ranking is integer arithmetic, so the
    differential pins the recommendation ORDER, not just the scores.

    100 TB shape: identical to q_market_basket (per-basket fan-out,
    broadcast denominators) plus one window partitioned by the
    antecedent part — never a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    n = b.groupBy("p").agg(F.count(F.lit(1)).alias("np"))
    orders = b.agg(F.countDistinct("k").alias("orders"))
    b2 = b.select("k", F.col("p").alias("p2"))
    pr = (
        b.join(b2, "k")
        .filter(F.col("p") != F.col("p2"))
        .groupBy(F.col("p").alias("p1"), F.col("p2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    scored = (
        pr.join(
            F.broadcast(
                n.withColumnRenamed("p", "p1").withColumnRenamed("np", "n1")
            ),
            "p1",
        )
        .join(
            F.broadcast(
                n.withColumnRenamed("p", "p2").withColumnRenamed("np", "n2")
            ),
            "p2",
        )
        .crossJoin(F.broadcast(orders))
        .select(
            "p1",
            "p2",
            F.col("support").cast("long").alias("support"),
            F.expr(
                "CAST(support * orders * 1000000 AS BIGINT) div (n1 * n2)"
            ).alias("lift_ppm"),
        )
    )
    w = Window.partitionBy("p1").orderBy(
        F.desc("lift_ppm"), F.desc("support"), "p2"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("p1").alias("part"),
            F.col("p2").alias("recommended"),
            "support",
            "lift_ppm",
            "rnk",
        )
    )


@query(
    "sketch_join_cardinality",
    f"""
    WITH items AS (
        SELECT 'A' AS side, CAST(o_custkey AS VARCHAR) AS tok FROM orders
        UNION ALL
        SELECT 'B', CAST(c_custkey AS VARCHAR) FROM customer
        WHERE c_acctbal > 0
    ),
    h AS (SELECT DISTINCT side, {_KMV_SQL_H} AS h FROM items),
    r AS (SELECT side, h,
                 row_number() OVER (PARTITION BY side ORDER BY h) AS rn
          FROM h),
    s AS (SELECT side, list(h ORDER BY h) AS ks,
                 CAST(count(*) AS BIGINT) AS n_k, max(h) AS kth
          FROM r WHERE rn <= {_KMV_K} GROUP BY side),
    p AS (
        SELECT a.n_k AS na, a.kth AS ka_th, b.n_k AS nb, b.kth AS kb_th,
               (list_sort(list_distinct(list_concat(a.ks, b.ks))))[1:{_KMV_K}] AS uk,
               a.ks AS ka, b.ks AS kb
        FROM s a JOIN s b ON a.side = 'A' AND b.side = 'B'
    ),
    q AS (
        SELECT *,
               CAST(len(list_intersect(list_intersect(uk, ka), kb)) AS DOUBLE)
                   / CAST(len(uk) AS DOUBLE) AS j_est,
               CASE WHEN len(uk) < {_KMV_K} THEN CAST(len(uk) AS DOUBLE)
                    ELSE ({_KMV_K - 1}.0 * 1152921504606846976.0)
                         / CAST(uk[{_KMV_K}] AS DOUBLE) END AS union_est
        FROM p
    ),
    x AS (
        SELECT CAST((SELECT count(DISTINCT o_custkey) FROM orders)
                    AS BIGINT) AS exact_a,
               CAST((SELECT count(DISTINCT c_custkey) FROM customer
                     WHERE c_acctbal > 0) AS BIGINT) AS exact_b,
               CAST((SELECT count(*) FROM
                     (SELECT DISTINCT o_custkey FROM orders) oa
                     JOIN (SELECT DISTINCT c_custkey FROM customer
                           WHERE c_acctbal > 0) cb
                       ON oa.o_custkey = cb.c_custkey) AS BIGINT)
                   AS exact_inter
    )
    SELECT
        CASE WHEN na < {_KMV_K} THEN CAST(na AS DOUBLE)
             ELSE ({_KMV_K - 1}.0 * 1152921504606846976.0)
                  / CAST(ka_th AS DOUBLE) END AS a_est,
        CASE WHEN nb < {_KMV_K} THEN CAST(nb AS DOUBLE)
             ELSE ({_KMV_K - 1}.0 * 1152921504606846976.0)
                  / CAST(kb_th AS DOUBLE) END AS b_est,
        union_est, j_est * union_est AS inter_est,
        exact_a, exact_b, exact_inter
    FROM q CROSS JOIN x
    """,
)
def sketch_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from KMV sketches — the optimizer-
    statistics move: estimate the distinct-key overlap of orders.custkey
    against a FILTERED customer dim (acctbal > 0) from two k=128
    sketches alone, alongside the exact counts so the driver row records
    the estimate AND its ground truth in one artifact.  At planning
    time this answers "will this join explode / is the FK dense?" by
    moving 2k int64s instead of scanning either side; the deterministic
    md5 hashing is what lets DuckDB reproduce every estimate bit-for-bit
    (engine-native HLL blobs can't be differentialed).

    100 TB shape: each side is one distinct + bounded top-k (the
    salted two-level pattern inside kmv_sketch); the estimator reads
    ≤2k longs.  The exact legs exist for the differential only —
    production consults the sketches."""
    from ..operators import sketch as K

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    items = o.select(
        F.lit("A").alias("side"),
        F.col("o_custkey").cast("string").alias("item"),
    ).unionByName(
        c.filter(F.col("c_acctbal") > 0).select(
            F.lit("B").alias("side"),
            F.col("c_custkey").cast("string").alias("item"),
        )
    )
    sk = K.kmv_sketch(items, ["side"], F.col("item"), k=_KMV_K)
    est = K.kmv_estimate_expr(_KMV_K)
    a = sk.filter(F.col("side") == "A").select(
        F.col("ks").alias("ka"), est.alias("a_est")
    )
    b = sk.filter(F.col("side") == "B").select(
        F.col("ks").alias("kb"), est.alias("b_est")
    )
    pair = a.crossJoin(b)
    cols = K.kmv_jaccard_cols(F.col("ka"), F.col("kb"), _KMV_K)
    exact = (
        o.select(F.col("o_custkey").alias("k"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
        .crossJoin(
            c.filter(F.col("c_acctbal") > 0)
            .select(F.col("c_custkey").alias("k"))
            .distinct()
            .agg(F.count(F.lit(1)).cast("long").alias("exact_b"))
        )
        .crossJoin(
            o.select(F.col("o_custkey").alias("k"))
            .distinct()
            .join(
                c.filter(F.col("c_acctbal") > 0)
                .select(F.col("c_custkey").alias("k"))
                .distinct(),
                "k",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
        )
    )
    return pair.select(
        "a_est",
        "b_est",
        cols["union_est"].alias("union_est"),
        cols["inter_est"].alias("inter_est"),
    ).crossJoin(exact)


@query(
    "q_attribution",
    """
    WITH e AS (
        SELECT user_id, event_type, value, epoch_ms(ts) AS tms,
               ts, event_id
        FROM events
    ),
    m AS (
        SELECT *,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER w
                   AS touch,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN tms END IGNORE NULLS) OVER w
                   AS touch_tms
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN touch IS NOT NULL AND tms - touch_tms <= 7200000
                THEN touch ELSE 'direct' END AS channel,
           CAST(count(*) AS BIGINT) AS conversions,
           round(sum(value), 6) AS revenue
    FROM m WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent non-purchase event within a 2-hour lookback
    (millisecond-exact integer time arithmetic on both engines), else
    'direct'; conversions and revenue aggregate per attributed channel.
    The standard product-analytics stage after funnels/retention.

    100 TB shape: ONE window partitioned by user (users parallelize),
    then a channel-sized aggregate — no self-join of the event stream,
    which is the naive formulation's quadratic trap."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts", "event_id",
        # ts is TIMESTAMP_NTZ; the session is UTC-pinned so the cast is
        # identity and unix_millis gets the TIMESTAMP it requires
        F.unix_millis(F.col("ts").cast("timestamp")).alias("tms"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    non_purchase_t = F.when(F.col("event_type") != "purchase", F.col("tms"))
    m = ev.withColumn(
        "touch", F.last(non_purchase, ignorenulls=True).over(w)
    ).withColumn(
        "touch_tms", F.last(non_purchase_t, ignorenulls=True).over(w)
    )
    channel = F.when(
        F.col("touch").isNotNull()
        & (F.col("tms") - F.col("touch_tms") <= 7200000),
        F.col("touch"),
    ).otherwise(F.lit("direct"))
    return (
        m.filter(F.col("event_type") == "purchase")
        .groupBy(channel.alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("conversions"),
            F.round(F.sum("value"), 6).alias("revenue"),
        )
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def _corr_sql() -> str:
    sums = ", ".join(
        f"sum({c}) AS s_{c}, sum({c} * {c}) AS ss_{c}" for c in _CORR_COLS
    )
    prods = ", ".join(
        f"sum({a} * {b}) AS sp_{a}_{b}" for a, b in _CORR_PAIRS
    )
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"round((n * sp_{a}_{b} - s_{a} * s_{b}) / "
        f"sqrt((n * ss_{a} - s_{a} * s_{a}) * (n * ss_{b} - s_{b} * s_{b})), 6)"
        f" AS corr FROM s"
        for a, b in _CORR_PAIRS
    )
    return (
        f"WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n, {sums}, {prods} "
        f"FROM lineitem) SELECT * FROM ({rows}) ORDER BY col_a, col_b"
    )


@query("q_correlation_matrix", _corr_sql())
def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the fact table's numeric
    columns from ONE aggregate — per column Σx and Σx², per pair Σxy
    (4 + 4·2 + 6 accumulators total), then the closed-form coefficient
    per pair.  The sufficient statistics merge associatively (partial
    aggregation / streaming law), and the whole matrix costs one scan no
    matter how many pairs.

    100 TB shape: one map-side-combined aggregate; the pair expansion
    happens on the 1-row statistics frame, never on the data."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(c).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for a, b in _CORR_PAIRS:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    s = li.agg(*aggs)
    pairs = None
    for a, b in _CORR_PAIRS:
        corr = (
            F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        ) / F.sqrt(
            (F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            * (F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        )
        row = s.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.round(corr, 6).alias("corr"),
        )
        pairs = row if pairs is None else pairs.unionByName(row)
    return pairs.orderBy("col_a", "col_b")


_PR_ITER_SQL = """
    c{i} AS (SELECT e.v AS node,
                    CAST(sum((850000 * r{p}.rank) // (1000000 * od.outdeg))
                         AS BIGINT) AS m
             FROM e JOIN r{p} ON e.u = r{p}.node JOIN od ON e.u = od.node
             GROUP BY e.v),
    r{i} AS (SELECT nodes.node,
                    CAST((150000 * 1000000000000) // (1000000 * g.n)
                         + COALESCE(c{i}.m, 0) AS BIGINT) AS rank
             FROM nodes CROSS JOIN g LEFT JOIN c{i} ON nodes.node = c{i}.node)
"""


@query(
    "graph_pagerank",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    e AS (SELECT DISTINCT prev AS u, event_type AS v FROM seq
          WHERE prev IS NOT NULL AND prev <> event_type),
    nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
    g AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n),
    od AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS outdeg
           FROM e GROUP BY u),
    r0 AS (SELECT node, CAST(1000000000000 // g.n AS BIGINT) AS rank
           FROM nodes CROSS JOIN g),
    """
    + ",".join(_PR_ITER_SQL.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
    SELECT node, rank FROM r3 ORDER BY rank DESC, node
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type TRANSITION graph (an edge u→v when
    some user fired v right after u) — 3 fixed iterations of
    ``graph.pagerank_fixed``, integer-exact so the oracle's unrolled
    3-CTE chain reproduces every rank bit-for-bit.

    100 TB shape: the edge derivation is one keyed window over events;
    the iteration joins carry node-sized rank tables (broadcast) against
    the edge set — rank state never exceeds node count regardless of
    event volume."""
    from ..operators.graph import pagerank_fixed
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    )
    edges = (
        seq.filter(
            F.col("prev").isNotNull() & (F.col("prev") != F.col("event_type"))
        )
        .select(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .distinct()
    )
    return pagerank_fixed(edges, iterations=3).orderBy(
        F.desc("rank"), "node"
    )


@query(
    "table_restore_travel",
    """
    WITH n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_all,
               CAST(count(*) FILTER (WHERE o_orderkey % 2 = 1) AS BIGINT)
                   AS n_odd,
               CAST(count(*) FILTER (WHERE o_orderkey % 3 = 0) AS BIGINT)
                   AS n_div3
        FROM orders
    )
    SELECT * FROM (
        SELECT 'count_v1' AS name, CAST(n_odd AS BIGINT) AS val FROM n
        UNION ALL SELECT 'count_v2', n_all FROM n
        UNION ALL SELECT 'count_v3', n_all - n_div3 FROM n
        UNION ALL SELECT 'current_count', n_all FROM n
        UNION ALL SELECT 'current_version', 4
    ) ORDER BY name
    """,
)
def table_restore_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE + time travel, end to end: v1 = odd orders, v2 = all,
    v3 = DELETE WHERE 3|key, then ``Table.restore(2)`` re-points the
    current state at v2 as a forward metadata-only commit (v4) — the
    result re-reads EVERY version plus the restored current state, so
    the differential pins that history stays append-only and the
    restore moved zero data (sink.restore_keyed_table)."""
    import shutil
    import tempfile

    from ..api import Engine

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    tmp = tempfile.mkdtemp(prefix="restore_")
    try:
        t = Engine(spark).table(f"{tmp}/t")
        t.merge(
            o.filter(F.col("o_orderkey") % 2 == 1),
            key="o_orderkey", num_buckets=8, vacuum=False,
        )
        t.merge(o, key="o_orderkey", vacuum=False)
        t.delete_where("o_orderkey % 3 = 0")
        v = t.restore(2)
        rows = [
            ("count_v1", t.read(version=1).count()),
            ("count_v2", t.read(version=2).count()),
            ("count_v3", t.read(version=3).count()),
            ("current_count", t.read().count()),
            ("current_version", v),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "name string, val long").orderBy("name")


# The indexed twin reuses text_bm25_topk's ORACLE verbatim: the index
# is exact, so the same SQL is the ground truth for both paths.
@query("text_bm25_indexed", None)
def text_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 from the PERSISTED inverted index (operators/text.py
    ``add_documents``/``bm25_from_index``) — built incrementally in two
    batches (odd then even doc_ids), queried by reading only the 4
    query terms' postings buckets.  Bit-identical to ``text_bm25_topk``
    (same integer-micro arithmetic), which is why this query shares its
    oracle SQL: the differential proves the INDEX path — incremental
    build included — equals the corpus-scan path exactly.

    100 TB shape: the build is one corpus tokenize+aggregate; queries
    touch q/num_buckets of the postings files (lookup_keys) and a
    doc-count-sized doclen table — the corpus is never re-read."""
    import shutil
    import tempfile

    from ..operators.text import add_documents, bm25_from_index

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="bm25idx_")
    try:
        add_documents(spark, docs.filter(F.col("doc_id") % 2 == 1), f"{tmp}/idx")
        add_documents(spark, docs.filter(F.col("doc_id") % 2 == 0), f"{tmp}/idx")
        out = bm25_from_index(spark, f"{tmp}/idx", _BM25_TERMS, n=20)
        rows = [(r.doc_id, r.bm25_micro) for r in out.collect()]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, bm25_micro long"
    ).orderBy(F.desc("bm25_micro"), "doc_id")


from .queries import ORACLE as _ORACLE_REG

_ORACLE_REG["text_bm25_indexed"] = _ORACLE_REG["text_bm25_topk"]


@query(
    "table_clone_shallow",
    """
    WITH g AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                      CAST(sum(o_custkey) AS BIGINT) AS s_all,
                      CAST(count(*) FILTER (WHERE o_orderkey % 100 = 0)
                           AS BIGINT) AS n_mod,
                      CAST(count(*) FILTER (WHERE o_orderkey % 101 = 0)
                           AS BIGINT) AS n_new
               FROM orders)
    SELECT * FROM (
        SELECT 'clone_files_premerge' AS name, CAST(0 AS BIGINT) AS val
        UNION ALL SELECT 'rows_clone_after', n_all + n_new FROM g
        UNION ALL SELECT 'rows_src_after', n_all FROM g
        UNION ALL SELECT 'sum_clone_after',
            s_all + 1000000 * n_mod + 7 * n_new FROM g
        UNION ALL SELECT 'sum_src_after', s_all FROM g
        UNION ALL SELECT 'version_clone_after', 2
        UNION ALL SELECT 'version_src_after', 1
    ) ORDER BY name
    """,
)
def table_clone_shallow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow clone end to end (``sink.clone_keyed_table``): orders
    becomes a keyed table, ``Table.clone`` snapshots it as pure
    metadata (the differential pins ZERO parquet files under the clone
    before divergence), then a divergent merge on the clone bumps
    o_custkey by 1e6 for 100-divisible keys and inserts fresh keys —
    the oracle reproduces every count/sum/version closed-form over
    ``orders``, proving the clone reads the full snapshot, diverges
    copy-on-write, and leaves the source untouched (rows, sum, AND
    version).

    100 TB shape: the clone itself is one manifest commit referencing
    the source's files in place — no data moves until (and except
    where) the clone diverges.
    """
    import glob as _glob
    import shutil
    import tempfile

    from ..api import Engine

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    tmp = tempfile.mkdtemp(prefix="clone_")
    try:
        t = Engine(spark).table(f"{tmp}/src")
        t.merge(o, key="o_orderkey", num_buckets=8)
        c = t.clone(f"{tmp}/dest")
        n_files_pre = len(
            _glob.glob(f"{tmp}/dest/**/*.parquet", recursive=True)
        )
        batch = o.filter(F.col("o_orderkey") % 100 == 0).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(1000000)
        ).unionByName(
            o.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + F.lit(10_000_000_000)).alias(
                    "o_orderkey"
                ),
                F.lit(7).cast("long").alias("o_custkey"),
            )
        )
        c.merge(batch, key="o_orderkey")
        rows = [
            ("clone_files_premerge", n_files_pre),
            ("rows_clone_after", c.read().count()),
            ("rows_src_after", t.read().count()),
            (
                "sum_clone_after",
                c.read().agg(F.sum("o_custkey")).collect()[0][0],
            ),
            (
                "sum_src_after",
                t.read().agg(F.sum("o_custkey")).collect()[0][0],
            ),
            ("version_clone_after", c.version()),
            ("version_src_after", t.version()),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "name string, val long").orderBy("name")


@query(
    "text_hybrid_rrf",
    f"""
    WITH t AS (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t
           WHERE term IN ('{_BM25_TERMS_SQL}') GROUP BY doc_id, term),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    g AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS T,
                 (SELECT CAST(count(*) AS BIGINT) FROM documents) AS D),
    s AS (SELECT tf.doc_id,
                 CAST(floor(1000000.0 *
                      ln((g.D - df.df + 0.5) / (df.df + 0.5) + 1.0))
                      AS BIGINT) AS idf_micro,
                 CAST(100 * g.T * tf.tf * 22 AS DOUBLE) AS nump,
                 CAST(1000 * g.T * tf.tf
                      + 12 * (25 * g.T + 75 * dl.dl * g.D) AS DOUBLE) AS denp
          FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN g),
    bm AS (SELECT doc_id,
                  CAST(sum(CAST(floor(CAST(idf_micro AS DOUBLE) * (nump / denp))
                           AS BIGINT)) AS BIGINT) AS bm25_micro
           FROM s GROUP BY doc_id
           ORDER BY bm25_micro DESC, doc_id LIMIT 50),
    lex AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id)
                        AS BIGINT) AS lex_rank
            FROM bm),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v FROM e WHERE vec_id = 0),
    cs AS (SELECT e.vec_id AS doc_id,
                  round(list_dot_product(qv.v, e.v) /
                        nullif(sqrt(list_dot_product(qv.v, qv.v)) *
                               sqrt(list_dot_product(e.v, e.v)), 0.0), 6)
                      AS cos
           FROM e CROSS JOIN qv WHERE e.vec_id <> 0
           ORDER BY cos DESC, doc_id LIMIT 50),
    sem AS (SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
                        AS BIGINT) AS sem_rank
            FROM cs)
    SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
           lex.lex_rank, sem.sem_rank,
           coalesce(CAST(floor(1000000000.0 / (60 + lex.lex_rank)) AS BIGINT), 0)
         + coalesce(CAST(floor(1000000000.0 / (60 + sem.sem_rank)) AS BIGINT), 0)
               AS rrf_micro
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    ORDER BY rrf_micro DESC, doc_id LIMIT 20
    """,
)
def text_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 (lexical) fused with the query
    embedding's cosine top-50 (semantic, vec 0 standing in for the
    encoded query — encoders aren't in-container, same stub philosophy
    as multimodal decode) via Reciprocal Rank Fusion
    (operators/text.py ``hybrid_rrf``; integer-exact contributions, so
    the fused ORDER, not just the scores, is oracle-pinned).

    100 TB shape: the two legs are each one corpus-linear pass (BM25's
    single scan + the 1×N query-broadcast cosine — per-query linear,
    NOT the fenced all-pairs brute force); fusion joins two 50-row
    frames, broadcast class."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = X.bm25_topk(docs, _BM25_TERMS, n=50)
    sem = S.knn_brute_force(emb, [0], k=50).select(
        F.col("neighbor_id").alias("doc_id"), "cosine_sim"
    )
    return X.hybrid_rrf(lex, sem, n=20)


@query(
    "dml_merge_full_sync",
    """
    WITH base AS (SELECT o_orderkey AS k, o_custkey AS c FROM orders),
    final AS (
        SELECT k, c + 1000000 AS c FROM base WHERE k % 4 = 0
        UNION ALL
        SELECT k, c FROM base WHERE k % 4 <> 0 AND c % 3 <> 0
    )
    SELECT * FROM (
        SELECT 'counts' AS kind, 'deleted' AS name,
               CAST((SELECT count(*) FROM base
                     WHERE k % 4 <> 0 AND c % 3 = 0) AS BIGINT) AS val
        UNION ALL SELECT 'counts', 'inserted', 0
        UNION ALL SELECT 'counts', 'updated',
            CAST((SELECT count(*) FROM base WHERE k % 4 = 0) AS BIGINT)
        UNION ALL SELECT 'final', 'n_rows',
            CAST((SELECT count(*) FROM final) AS BIGINT)
        UNION ALL SELECT 'final', 'sum_c',
            CAST((SELECT sum(c) FROM final) AS BIGINT)
    ) ORDER BY kind, name
    """,
)
def dml_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE's third clause family end to end
    (``when_not_matched_by_source_*``, Delta 2.4): the source is the
    complete truth — matched keys take the source's value, target keys
    ABSENT from the source delete when they hit the predicate — in the
    same single MOR delta commit as the other clauses.  The oracle
    rebuilds the synced state closed-form (integer sums only), pinning
    the absence-scoped delete's row-level semantics, the update
    restatement, and the action counts at once.

    100 TB shape: the by-source scope is defined by absence, so every
    live bucket is scanned (Delta documents the same cost) — but only
    keys the clause changes are restated, so the WRITE stays
    O(changed keys), and the scan is the one full pass the semantics
    inherently require."""
    import shutil
    import tempfile

    from ..api import Engine

    o = load_table(spark, sf_dir, "orders")
    base = o.select("o_orderkey", F.col("o_custkey").alias("c"))
    src = o.filter(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey", (F.col("o_custkey") + F.lit(1000000)).alias("c")
    )
    tmp = tempfile.mkdtemp(prefix="mfs_")
    try:
        t = Engine(spark).table(f"{tmp}/t")
        t.merge(base, key="o_orderkey", num_buckets=8)
        res = t.merge_into(
            src,
            when_matched_update={"c": "s_c"},
            when_not_matched_insert=False,
            when_not_matched_by_source_delete="c % 3 = 0",
        )
        final = t.read().agg(
            F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
        ).collect()[0]
        rows = [
            ("counts", "deleted", res["deleted"]),
            ("counts", "inserted", res["inserted"]),
            ("counts", "updated", res["updated"]),
            ("final", "n_rows", final.n),
            ("final", "sum_c", final.s),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "kind string, name string, val long"
    ).orderBy("kind", "name")


def _mmr_sim_sql(a: str, b: str) -> str:
    """Rounded-6 cosine scaled to micro as BIGINT, NULL (zero vector)
    counting as -1e6 — the exact integerization mmr_select uses."""
    return (
        f"coalesce(CAST(round(round(list_dot_product({a}, {b}) / "
        f"nullif(sqrt(list_dot_product({a}, {a})) * "
        f"sqrt(list_dot_product({b}, {b})), 0.0), 6) * 1000000.0) "
        f"AS BIGINT), -1000000)"
    )


def _mmr_oracle_sql(k: int = 5, n_cand: int = 20, lam: int = 700_000) -> str:
    """Unrolled greedy-MMR oracle (PageRank's unrolled-CTE idiom): step t
    picks the argmax of ``lam*rel - (1e6-lam)*max_sim`` over survivors,
    step t+1 folds the new pick into each survivor's running max-sim."""
    mu = 1_000_000 - lam
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),",
        "qv AS (SELECT v FROM e WHERE vec_id = 0),",
        "cand AS (SELECT e.vec_id AS doc_id,",
        "                CAST(round(round(list_dot_product(qv.v, e.v) /",
        "                     nullif(sqrt(list_dot_product(qv.v, qv.v)) *",
        "                            sqrt(list_dot_product(e.v, e.v)), 0.0), 6)",
        "                     * 1000000.0) AS BIGINT) AS rel, e.v AS v",
        "         FROM e CROSS JOIN qv WHERE e.vec_id <> 0",
        f"         ORDER BY rel DESC, doc_id LIMIT {n_cand}),",
        f"s1 AS (SELECT doc_id, v, rel, {lam} * rel AS mmr,",
        "              CAST(1 AS INT) AS r",
        "       FROM cand ORDER BY rel DESC, doc_id LIMIT 1),",
    ]
    for t in range(2, k + 1):
        prev_m, prev_s = f"m{t - 1}", f"s{t - 1}"
        src = "cand" if t == 2 else f"m{t - 2}"
        ms = (
            _mmr_sim_sql("c.v", "s.v")
            if t == 2
            else f"greatest(c.ms, {_mmr_sim_sql('c.v', 's.v')})"
        )
        parts.append(
            f"{prev_m} AS (SELECT c.doc_id, c.rel, c.v, {ms} AS ms"
            f" FROM {src} c, {prev_s} s WHERE c.doc_id <> s.doc_id),"
        )
        parts.append(
            f"s{t} AS (SELECT doc_id, v, rel,"
            f" {lam} * rel - {mu} * ms AS mmr, CAST({t} AS INT) AS r"
            f" FROM {prev_m} ORDER BY mmr DESC, doc_id LIMIT 1),"
        )
    union = " UNION ALL ".join(
        f"SELECT r, doc_id, rel, mmr FROM s{t}" for t in range(1, k + 1)
    )
    parts.append(
        "u AS (" + union + ") "
        "SELECT r AS mmr_rank, doc_id, rel AS rel_micro, mmr AS mmr_micro "
        "FROM u ORDER BY mmr_rank"
    )
    return "\n".join(parts)


@query("text_mmr_diversify", _mmr_oracle_sql())
def text_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (``similarity.mmr_select``): the
    cosine top-20 for the query embedding (vec 0, the hybrid-RRF
    convention) re-ranked greedily by
    ``0.7·relevance − 0.3·max-sim-to-selected``, top 5 — the
    context-window diversity stage after BM25/ANN/RRF relevance
    ranking.  All-integer objective, so the oracle's unrolled 5-step
    CTE chain reproduces the selection ORDER bit-for-bit (ties by
    doc_id), not just the scores.

    100 TB shape: corpus-sized work lives in the leg that built the
    top-20 (here the per-query linear scan; the IVF index at scale);
    MMR itself is k argmax aggregates + k single-row broadcast joins
    over L-row groups, distributed across queries via ``group_col``."""
    emb = load_table(spark, sf_dir, "embeddings")
    cand = (
        S.knn_brute_force(emb, [0], k=20)
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.round(F.col("cosine_sim") * F.lit(1_000_000.0))
            .cast("long")
            .alias("rel_micro"),
        )
        .join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
            "doc_id",
        )
    )
    return S.mmr_select(cand, k=5, lambda_ppm=700_000)


@query(
    "table_append_optimize",
    """
    WITH g AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                      CAST(sum(o_custkey) AS BIGINT) AS s_all
               FROM orders)
    SELECT * FROM (
        SELECT 'cdf_changes_of_optimize' AS name, CAST(0 AS BIGINT) AS val
        UNION ALL SELECT 'fpb_before_gt_after', 1
        UNION ALL SELECT 'max_fpb_after', 1
        UNION ALL SELECT 'rows_after', n_all FROM g
        UNION ALL SELECT 'rows_travel_pre_optimize', n_all FROM g
        UNION ALL SELECT 'sum_after', s_all FROM g
        UNION ALL SELECT 'version_after', 4
    ) ORDER BY name
    """,
)
def table_append_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta ingest pattern end to end (``sink.keyed_append`` +
    ``sink.optimize_keyed_table``): a third of orders merges as the
    base, two more thirds arrive as O(batch) NEW-key appends (no
    existing file read or rewritten), buckets accrue multiple files
    (``fpb_before_gt_after`` pins it), then OPTIMIZE bin-packs every
    bucket back to one file — with the change feed across the optimize
    commit EMPTY (data provably unchanged), time travel to the
    pre-optimize snapshot intact, and the closed-form oracle
    reproducing rows/sum/version over ``orders``.

    100 TB shape: append cost is the batch alone regardless of table
    size; optimize reads only over-threshold buckets on a maintenance
    schedule."""
    import shutil
    import tempfile

    from .. import sink as _sink
    from ..api import Engine

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    tmp = tempfile.mkdtemp(prefix="appopt_")
    try:
        t = Engine(spark).table(f"{tmp}/t")
        t.merge(
            o.filter(F.col("o_orderkey") % 3 == 0),
            key="o_orderkey",
            num_buckets=8,
        )
        t.append(o.filter(F.col("o_orderkey") % 3 == 1), key="o_orderkey")
        t.append(o.filter(F.col("o_orderkey") % 3 == 2), key="o_orderkey")
        fpb_before = _sink.describe_keyed_table(t.path)[
            "max_files_per_bucket"
        ]
        v_pre = t.version()
        t.optimize()
        fpb_after = _sink.describe_keyed_table(t.path)[
            "max_files_per_bucket"
        ]
        rows = [
            ("cdf_changes_of_optimize", t.changes(v_pre).count()),
            ("fpb_before_gt_after", 1 if fpb_before > fpb_after else 0),
            ("max_fpb_after", fpb_after),
            ("rows_after", t.read().count()),
            ("rows_travel_pre_optimize", t.read(version=v_pre).count()),
            (
                "sum_after",
                t.read().agg(F.sum("o_custkey")).collect()[0][0],
            ),
            ("version_after", t.version()),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "name string, val long").orderBy(
        "name"
    )


def _kmeans_oracle_sql(
    k: int = 8,
    iterations: int = 3,
    scale: int = 1_000_000,
    final_select: str | None = None,
) -> str:
    """Unrolled Lloyd's-iteration oracle: a_t assigns against c_{t-1}
    (integer squared L2, ties on cid), c_t is the truncated integer
    mean of a_t's members; output = assignment against c_iterations.
    DuckDB's ``//`` and Spark's ``DIV`` both truncate toward zero, and
    every distance term is an integer < 2^53 — so the chain is
    bit-identical cross-engine."""

    def dist(p: str, c: str) -> str:
        return (
            f"CAST({p}.n2 + {c}.cn2 - 2 * list_dot_product({p}.v, {c}.cv) "
            "AS BIGINT)"
        )

    parts = [
        "WITH e AS (SELECT vec_id AS pid,",
        f"  list_transform(embedding::DOUBLE[], x -> CAST(floor(x * {scale}.0)",
        "  AS BIGINT)) AS v FROM embeddings),",
        "p AS (SELECT pid, v, CAST(list_dot_product(v, v) AS BIGINT) AS n2",
        "      FROM e),",
        "c0 AS (SELECT row_number() OVER (ORDER BY pid) - 1 AS cid,",
        f"       v AS cv, n2 AS cn2 FROM p ORDER BY pid LIMIT {k}),",
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f"a{t} AS (SELECT pid, v, cid FROM ("
            f"SELECT p.pid, p.v, c.cid, row_number() OVER ("
            f"PARTITION BY p.pid ORDER BY {dist('p', 'c')}, c.cid) AS rn"
            f" FROM p CROSS JOIN c{t - 1} c) WHERE rn = 1),"
        )
        parts.append(
            f"c{t} AS (SELECT cid, cv,"
            " CAST(list_dot_product(cv, cv) AS BIGINT) AS cn2 FROM ("
            "SELECT cid, list(m ORDER BY pos) AS cv FROM ("
            "SELECT a.cid, i AS pos,"
            " CAST(sum(a.v[i]) AS BIGINT) // count(*) AS m"
            f" FROM a{t} a, unnest(generate_series(1, len(a.v))) AS t(i)"
            " GROUP BY a.cid, i) GROUP BY cid)),"
        )
    parts.append(
        "fin AS (SELECT pid, cid, d FROM ("
        f"SELECT p.pid, c.cid, {dist('p', 'c')} AS d,"
        f" row_number() OVER (PARTITION BY p.pid ORDER BY {dist('p', 'c')},"
        f" c.cid) AS rn FROM p CROSS JOIN c{iterations} c) WHERE rn = 1) "
        + (
            final_select
            or "SELECT pid AS vec_id, CAST(cid AS BIGINT) AS cluster,"
            " d AS dist_q FROM fin ORDER BY vec_id"
        )
    )
    return "\n".join(parts)


@query("cluster_kmeans", _kmeans_oracle_sql())
def cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration Lloyd's k-means over the embeddings corpus
    (``operators/clustering.kmeans_fixed``, k=8, 3 iterations) — the
    clustering primitive for cluster-based curation (SemDeDup-style
    semantic dedup, cluster-balanced mixing) and a trainable IVF
    quantizer.  The differential pins EVERY point's final cluster and
    integer squared distance, so a single mis-assigned vector anywhere
    in the 3-iteration chain fails the oracle.

    100 TB shape: centroids (k·d integers) broadcast; assignment is
    map-side argmin, the update one (cluster,dim) aggregate with
    map-side partials; the corpus shuffles nowhere."""
    from ..operators.clustering import kmeans_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fixed(emb, k=8, iterations=3).orderBy("vec_id")


@query(
    "pipeline_cluster_prototypes",
    _kmeans_oracle_sql(
        final_select=(
            "SELECT cluster, vec_id, dist_q, rank FROM ("
            "SELECT CAST(cid AS BIGINT) AS cluster, pid AS vec_id,"
            " d AS dist_q,"
            " row_number() OVER (PARTITION BY cid ORDER BY d, pid) AS rank"
            " FROM fin) WHERE rank <= 5 ORDER BY cluster, rank"
        )
    ),
)
def pipeline_cluster_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced prototype selection — the curation move k-means
    buys (SemDeDup/DsDm shape): cluster the embedding corpus, keep the
    5 most central points per cluster (smallest integer squared L2 to
    the trained centroid, ties on id).  Balanced coverage of the
    embedding space at a fixed budget, instead of a global top-k that
    over-samples the densest region; the same window inverted (rank
    DESC) is outlier mining.

    100 TB shape: on top of k-means' broadcast assignment, selection is
    one per-cluster top-k window — partitioned by cluster, never a
    global sort."""
    from ..operators.clustering import kmeans_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("cluster").orderBy(F.asc("dist_q"), F.asc("vec_id"))
    return (
        kmeans_fixed(emb, k=8, iterations=3)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("cluster", "vec_id", "dist_q", "rank")
        .orderBy("cluster", "rank")
    )


@query(
    "view_join_ivm",
    """
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(FLOOR(o_totalprice)) AS BIGINT) AS sum_amt
    FROM orders
    JOIN (SELECT c_custkey,
                 CASE WHEN c_custkey % 10 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment
          FROM customer) ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
)
def view_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained JOIN view (``views.refresh_join_view``)
    end to end — the star-schema rollup ``orders ⋈ customer`` grouped by
    market segment, built over three commits: v1 facts (odd orderkeys) →
    full refresh; v2 facts (the rest) → incremental refresh that reads
    ONLY the changed fact files with the dim untouched (the production
    fast path, Δ R⋈S_new); a dim update that MOVES every 10th customer
    to a new segment → incremental refresh whose R_old⋈ΔS term migrates
    the affected facts between groups.  The oracle reproduces the final
    rollup closed-form, so the differential pins the delta-join algebra
    (signed weights, group moves, the lot) against one declarative SQL
    join.  Modes are asserted in-query: a refresh that silently fell
    back to a full recompute FAILS the row, not just the timing.

    Sums run over floor(o_totalprice) — integer-valued doubles, so the
    incremental accumulation is exact and the differential needs no
    rounding tolerance.

    100 TB shape: the fact side is only ever read incrementally
    (changed buckets); the dim is broadcast both ways; a dim change
    costs one broadcast-hash pass over the old fact snapshot — never a
    shuffle, and the 100 TB table is never rescanned while dims hold
    still."""
    import shutil
    import tempfile

    from ..sink import keyed_overwrite_parquet
    from ..views import read_aggregate_view, refresh_join_view

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.floor("o_totalprice").alias("amt"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    tmp = tempfile.mkdtemp(prefix="joinivm_")
    try:
        fact, dim, mv = f"{tmp}/fact", f"{tmp}/dim", f"{tmp}/mv"
        keyed_overwrite_parquet(
            spark, o.filter(F.col("o_orderkey") % 2 == 1), fact,
            key="o_orderkey", num_buckets=8, vacuum=False,
        )
        keyed_overwrite_parquet(
            spark, c, dim, key="c_custkey", num_buckets=4, vacuum=False
        )
        args = (spark, fact, dim, mv, "c_custkey", ["c_mktsegment"], ["amt"])
        r1 = refresh_join_view(*args)
        keyed_overwrite_parquet(
            spark, o.filter(F.col("o_orderkey") % 2 == 0), fact,
            key="o_orderkey", vacuum=False,
        )
        r2 = refresh_join_view(*args)
        keyed_overwrite_parquet(
            spark,
            c.filter(F.col("c_custkey") % 10 == 0)
            .withColumn("c_mktsegment", F.lit("MOVED")),
            dim, key="c_custkey", vacuum=False,
        )
        r3 = refresh_join_view(*args)
        if not (
            r1["mode"] == "full"
            and r2["mode"] == "incremental" and not r2["fact_rescan"]
            and r3["mode"] == "incremental" and r3["fact_rescan"]
        ):
            raise RuntimeError(
                f"join-view refresh modes regressed: {r1['mode']}, "
                f"{r2['mode']}/rescan={r2['fact_rescan']}, "
                f"{r3['mode']}/rescan={r3['fact_rescan']}"
            )
        rows = [
            (x.c_mktsegment, x.n, int(x.sum_amt))
            for x in read_aggregate_view(spark, mv).collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "segment string, n long, sum_amt long"
    ).orderBy("segment")


@query(
    "view_star_ivm",
    """
    SELECT brand,
           nation,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(FLOOR(l_extendedprice)) AS BIGINT) AS sum_amt
    FROM lineitem
    JOIN (SELECT p_partkey,
                 CASE WHEN p_partkey % 7 = 0 THEN 'MOVEDBRAND'
                      ELSE p_brand END AS brand
          FROM part) ON l_partkey = p_partkey
    JOIN (SELECT s_suppkey,
                 CAST(CASE WHEN s_suppkey % 5 = 0 THEN 999
                      ELSE s_nationkey END AS BIGINT) AS nation
          FROM supplier) ON l_suppkey = s_suppkey
    GROUP BY brand, nation
    ORDER BY brand, nation
    """,
)
def view_star_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-dim star-view IVM (``views.refresh_star_view``) end to end —
    the rollup ``lineitem ⋈ part ⋈ supplier`` grouped by (brand,
    nation), maintained over: v1 facts (odd line keys) → full; v2 facts
    (the rest) → the fast path (changed fact files only, both dims
    broadcast, no rescan); then BOTH dims change before ONE refresh —
    every 7th part moves brand and every 5th supplier moves nation —
    exercising the telescoping convention (term i reads tables j<i at
    their OLD versions) on rows whose two dim attributes moved at once;
    a naive all-current implementation double-counts exactly those.
    The oracle reproduces the final rollup closed-form over the raw
    tables.  Refresh modes are asserted in-query.

    Sums run over floor(l_extendedprice): integer-valued doubles, exact
    accumulation, no rounding tolerance in the differential.

    100 TB shape: the fact is only ever read incrementally while dims
    hold still (measured flat at 64× — SCALE.md); each changed dim adds
    one broadcast-hash pass over the old fact snapshot, zero shuffles
    beyond the final group-by."""
    import shutil
    import tempfile

    from ..sink import keyed_overwrite_parquet
    from ..views import read_aggregate_view, refresh_star_view

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("lkey"),
        F.col("l_partkey").alias("p_partkey"),
        F.col("l_suppkey").alias("s_suppkey"),
        F.floor("l_extendedprice").alias("amt"),
    )
    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    sp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("long").alias("nation")
    )
    tmp = tempfile.mkdtemp(prefix="starivm_")
    try:
        fact, d1, d2, mv = f"{tmp}/f", f"{tmp}/d1", f"{tmp}/d2", f"{tmp}/mv"
        keyed_overwrite_parquet(
            spark, li.filter(F.col("lkey") % 2 == 1), fact,
            key="lkey", num_buckets=8, vacuum=False,
        )
        keyed_overwrite_parquet(spark, pt, d1, key="p_partkey",
                                num_buckets=4, vacuum=False)
        keyed_overwrite_parquet(spark, sp, d2, key="s_suppkey",
                                num_buckets=2, vacuum=False)
        args = (spark, fact, [(d1, "p_partkey"), (d2, "s_suppkey")], mv,
                ["brand", "nation"], ["amt"])
        r1 = refresh_star_view(*args)
        keyed_overwrite_parquet(
            spark, li.filter(F.col("lkey") % 2 == 0), fact,
            key="lkey", vacuum=False,
        )
        r2 = refresh_star_view(*args)
        keyed_overwrite_parquet(
            spark,
            pt.filter(F.col("p_partkey") % 7 == 0)
            .withColumn("brand", F.lit("MOVEDBRAND")),
            d1, key="p_partkey", vacuum=False,
        )
        keyed_overwrite_parquet(
            spark,
            sp.filter(F.col("s_suppkey") % 5 == 0)
            .withColumn("nation", F.lit(999).cast("long")),
            d2, key="s_suppkey", vacuum=False,
        )
        r3 = refresh_star_view(*args)
        if not (
            r1["mode"] == "full"
            and r2["mode"] == "incremental" and not r2["fact_rescan"]
            and r3["mode"] == "incremental" and r3["fact_rescan"]
            and r3["dim_files_read"] > 0
        ):
            raise RuntimeError(
                f"star-view refresh modes regressed: {r1['mode']}, "
                f"{r2['mode']}/rescan={r2['fact_rescan']}, "
                f"{r3['mode']}/rescan={r3['fact_rescan']}"
            )
        rows = [
            (x.brand, x.nation, x.n, int(x.sum_amt))
            for x in read_aggregate_view(spark, mv).collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "brand string, nation long, n long, sum_amt long"
    ).orderBy("brand", "nation")


@query(
    "q_ab_test",
    """
    WITH m AS (
        SELECT user_id % 2 AS variant,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
               CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)
                        * CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
                   AS sumsq_c
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT CAST(variant AS BIGINT) AS variant, n, sum_c, sumsq_c,
           CAST(FLOOR(1000000.0 * sum_c / n / 100.0) AS BIGINT) AS mean_ppm,
           CAST(FLOOR(1000.0 * ((sumsq_c - 1.0 * sum_c * sum_c / n)
                                / (n - 1)) / 10000.0) AS BIGINT)
               AS var_milli
    FROM m ORDER BY variant
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — per-variant sample moments for a Welch
    t-test over the purchase-value metric, variant = ``user_id % 2``
    (the deterministic hash split an experimentation platform ships).
    Values are floored to integer centi-units PER ROW first, so n /
    Σx / Σx² are integer-exact and order-independent — the one honest
    way to differential-test second moments across engines (a raw
    double Σx² is accumulation-order noise).  Mean (ppm) and sample
    variance (milli) derive from those integers through the same IEEE
    double formula on both sides.  The t statistic itself is one more
    scalar expression over this frame; the moments are the part worth a
    100 TB plan.

    100 TB shape: ONE map-side-combinable hash aggregate over the
    filtered fact — variants are 2 groups, so the reduce side is
    trivially tiny; no window, no join, no second pass."""
    ev = load_table(spark, sf_dir, "events")
    v_c = F.floor(F.col("value") * 100).cast("long")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select((F.col("user_id") % 2).cast("long").alias("variant"),
                v_c.alias("v_c"))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v_c").cast("long").alias("sum_c"),
            F.sum(F.col("v_c") * F.col("v_c")).cast("long").alias("sumsq_c"),
        )
        .select(
            "variant", "n", "sum_c", "sumsq_c",
            F.floor(F.lit(1000000.0) * F.col("sum_c") / F.col("n") / F.lit(100.0))
            .cast("long").alias("mean_ppm"),
            F.floor(
                F.lit(1000.0)
                * (
                    (F.col("sumsq_c")
                     - F.lit(1.0) * F.col("sum_c") * F.col("sum_c") / F.col("n"))
                    / (F.col("n") - 1)
                )
                / F.lit(10000.0)
            ).cast("long").alias("var_milli"),
        )
        .orderBy("variant")
    )


@query(
    "q_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ), pairs AS (
        SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS cnt
        FROM seq WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    )
    SELECT prev, next, cnt,
           CAST(1000000 * cnt // sum(cnt) OVER (PARTITION BY prev)
                AS BIGINT) AS prob_ppm
    FROM pairs
    ORDER BY prev, next
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    — the "what do users do next" readout behind journey analytics and
    next-action models.  Probabilities are integer ppm by floor
    division, so the differential is exact.

    100 TB shape: one hash(user_id) exchange feeds the lag window; the
    pair counting is a map-side-combinable aggregate over event-type
    pairs (alphabet², tiny), and the normalizing window runs on that
    tiny frame — the raw stream is read once."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    )
    pairs = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        pairs.withColumn("total", F.sum("cnt").over(W.partitionBy("prev")))
        .select(
            "prev", "next", "cnt",
            F.expr("1000000 * cnt div total").cast("long").alias("prob_ppm"),
        )
        .orderBy("prev", "next")
    )


@query(
    "view_minmax_ivm",
    """
    WITH t AS (
        SELECT o_custkey % 1000 AS gkey,
               CAST(FLOOR(o_totalprice) AS BIGINT)
                 * CASE WHEN o_custkey % 1000 < 10 THEN 2 ELSE 1 END AS amt
        FROM orders WHERE o_orderkey % 97 <> 0
    )
    SELECT CAST(gkey AS BIGINT) AS gkey,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(amt) AS BIGINT) AS sum_amt,
           CAST(min(amt) AS BIGINT) AS min_amt,
           CAST(max(amt) AS BIGINT) AS max_amt
    FROM t GROUP BY gkey ORDER BY gkey
    """,
)
def view_minmax_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX materialized view maintained by touched-group partial
    recompute (``views.refresh_minmax_view``) — the aggregate family
    signed-delta IVM cannot carry, exercised through its hard cases:
    a DELETE that removes group extrema (v2: every 97th order, then
    compaction to restore clean endpoints) and an UPDATE that doubles
    amounts for 10 of the 1000 groups (v3).  After each commit the view
    refreshes incrementally: the manifest diff names the touched
    groups, only those re-aggregate from the table, untouched groups
    pass through.  The oracle reproduces the final state closed-form —
    an extremum the recompute missed (the signed-delta failure mode)
    would hash-mismatch immediately.  Modes asserted in-query.

    100 TB shape: recompute cost is the files containing touched
    groups' rows — CoW rewrites whole buckets, so group↔file locality
    (``cluster_by``/``zorder`` on the group column, stats-tracked for
    the pruned scan) is what keeps a local batch's recompute local; the
    driver-side group list is hard-capped (MINMAX_TOUCHED_GROUP_CAP)
    with a full-recompute fallback, never an unbounded collect."""
    import shutil
    import tempfile

    from ..sink import (
        compact_keyed_table,
        keyed_delete_where,
        keyed_overwrite_parquet,
    )
    from ..views import read_aggregate_view, refresh_minmax_view

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 1000).cast("long").alias("gkey"),
        F.floor("o_totalprice").alias("amt"),
    )
    tmp = tempfile.mkdtemp(prefix="minmaxivm_")
    try:
        target, mv = f"{tmp}/t", f"{tmp}/mv"
        keyed_overwrite_parquet(
            spark, o, target, key="o_orderkey", num_buckets=8,
            stats_cols=["gkey"], vacuum=False,
        )
        args = (spark, target, mv, ["gkey"], ["amt"])
        r1 = refresh_minmax_view(*args)
        keyed_delete_where(spark, target, "o_orderkey % 97 = 0")
        compact_keyed_table(spark, target)
        r2 = refresh_minmax_view(*args)
        keyed_overwrite_parquet(
            spark,
            o.filter(
                (F.col("gkey") < 10) & (F.col("o_orderkey") % 97 != 0)
            ).withColumn("amt", F.col("amt") * 2),
            target, key="o_orderkey", vacuum=False,
        )
        r3 = refresh_minmax_view(*args)
        if not (
            r1["mode"] == "full"
            and r2["mode"] == "incremental"
            and r3["mode"] == "incremental"
            and 0 < r3["groups_recomputed"] <= 1000
        ):
            raise RuntimeError(
                f"minmax-view refresh modes regressed: {r1['mode']}, "
                f"{r2['mode']}, {r3['mode']}/{r3['groups_recomputed']}"
            )
        rows = [
            (x.gkey, x.n, int(x.sum_amt), x.min_amt, x.max_amt)
            for x in read_aggregate_view(spark, mv).collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "gkey long, n long, sum_amt long, min_amt long, max_amt long"
    ).orderBy("gkey")


_DVK = 32  # KMV k for the distinct view — small enough that groups hit
#            the fill line at sf0.01, so the estimator path is exercised


@query(
    "view_distinct_ivm",
    f"""
    WITH t AS (
        SELECT o_custkey % 50 AS gkey,
               CAST(o_orderkey % 997 AS VARCHAR) AS item
        FROM orders
        WHERE (o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0)
           OR o_orderkey % 3 = 1
    ),
    h AS (SELECT DISTINCT gkey,
                 CAST('0x' || substr(md5(item), 1, 15) AS BIGINT) AS h
          FROM t),
    r AS (SELECT gkey, h,
                 row_number() OVER (PARTITION BY gkey ORDER BY h) AS rn
          FROM h),
    s AS (SELECT gkey, CAST(count(*) AS BIGINT) AS n_k, max(h) AS kth
          FROM r WHERE rn <= {_DVK} GROUP BY gkey)
    SELECT CAST(gkey AS BIGINT) AS gkey, n_k, kth,
           CASE WHEN n_k < {_DVK} THEN CAST(n_k AS DOUBLE)
                ELSE {float(_DVK - 1)} * 1152921504606846976.0
                     / CAST(kth AS DOUBLE) END AS est_distinct
    FROM s ORDER BY gkey
    """,
)
def view_distinct_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-COUNT-DISTINCT materialized view stored as a KMV sketch
    (``views.refresh_distinct_view``) — the aggregate family neither
    signed-delta IVM (no subtraction) nor cheap recompute (state = the
    whole distinct set) can carry.  Lifecycle: build (full) → DELETE
    every 5th source order + compaction → touched-group partial
    recompute → APPEND of a disjoint key range → the sketch-merge fast
    path, which reads ONLY the appended files and the view itself
    (``groups_recomputed == 0``, asserted in-query).  Ordering the
    delete BEFORE the append means the final hash verifies BOTH
    maintenance paths: the recomputed sketches flow through the append
    merge into the output.  The oracle rebuilds the final-state KMV
    closed-form — a single wrong hash in any path mismatches.

    100 TB shape: the fact-stream case (hourly appends to an events
    table with a distinct-users-per-group dashboard) refreshes in
    O(batch + view) — even the minmax view's partial recompute would
    rescan every historical file of the touched groups, and an exact
    distinct view would hold the full distinct set as state."""
    import shutil
    import tempfile

    from ..sink import (
        compact_keyed_table,
        keyed_append,
        keyed_delete_where,
        keyed_overwrite_parquet,
    )
    from ..views import read_distinct_view, refresh_distinct_view

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 50).cast("long").alias("gkey"),
        (F.col("o_orderkey") % 997).cast("string").alias("item"),
    )
    tmp = tempfile.mkdtemp(prefix="distinctivm_")
    try:
        target, mv = f"{tmp}/t", f"{tmp}/mv"
        keyed_overwrite_parquet(
            spark, o.filter(F.col("o_orderkey") % 3 == 0), target,
            key="o_orderkey", num_buckets=8, stats_cols=["gkey"],
            vacuum=False,
        )
        args = (spark, target, mv, ["gkey"], "item")
        r1 = refresh_distinct_view(*args, k=_DVK)
        keyed_delete_where(spark, target, "o_orderkey % 5 = 0")
        compact_keyed_table(spark, target)
        r2 = refresh_distinct_view(*args, k=_DVK)
        keyed_append(
            spark, o.filter(F.col("o_orderkey") % 3 == 1), target,
            key="o_orderkey",
        )
        r3 = refresh_distinct_view(*args, k=_DVK)
        if not (
            r1["mode"] == "full"
            and r2["mode"] == "incremental"
            and r2["groups_recomputed"] > 0
            and r3["mode"] == "incremental"
            and r3["groups_recomputed"] == 0
        ):
            raise RuntimeError(
                f"distinct-view refresh modes regressed: {r1['mode']}, "
                f"{r2['mode']}/{r2['groups_recomputed']}, "
                f"{r3['mode']}/{r3['groups_recomputed']}"
            )
        rows = [
            (x.gkey, x.n_k, x.kth, x.est_distinct)
            for x in read_distinct_view(spark, mv).collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "gkey long, n_k long, kth long, est_distinct double"
    ).orderBy("gkey")


_QVK = 64  # bottom-k sample size for the quantile view


@query(
    "view_quantile_ivm",
    f"""
    WITH t AS (
        SELECT event_type, value, event_id FROM events
        WHERE ((event_id % 2 = 0 AND event_id % 7 <> 0) OR event_id % 2 = 1)
          AND value IS NOT NULL
    ),
    h AS (SELECT event_type, value,
                 CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                      1, 15) AS BIGINT) AS hh
          FROM t),
    r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY hh) AS rn FROM h),
    s AS (SELECT event_type, value, hh FROM r WHERE rn <= {_QVK}),
    rk AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, hh) AS vr,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM s)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_sample,
           max(CASE WHEN vr = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                    THEN value END) AS p50,
           max(CASE WHEN vr = greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
                    THEN value END) AS p90,
           max(CASE WHEN vr = greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
                    THEN value END) AS p99
    FROM rk GROUP BY event_type
    ORDER BY event_type
    """,
    rotation=False,
)
def view_quantile_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile materialized view stored as a mergeable bottom-k row
    sample (``views.refresh_quantile_view``): per-event-type latency
    percentiles maintained across a DELETE (touched-group recompute)
    followed by an APPEND (sample-merge fast path, reads only the
    appended files — ``groups_recomputed == 0`` asserted in-query).
    The sample is the k smallest md5(event_id) hashes per group — merge
    is "k smallest of the union", the KMV property over rows — and the
    read picks exact type-1 quantiles of the sample, bit-exact members
    of the value column, so the oracle reproduces the final state
    hash-for-hash with no tolerance."""
    import shutil
    import tempfile

    from ..sink import (
        compact_keyed_table,
        keyed_append,
        keyed_delete_where,
        keyed_overwrite_parquet,
    )
    from ..views import read_quantile_view, refresh_quantile_view

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="quantivm_")
    try:
        target, mv = f"{tmp}/t", f"{tmp}/mv"
        keyed_overwrite_parquet(
            spark, ev.filter(F.col("event_id") % 2 == 0), target,
            key="event_id", num_buckets=8, vacuum=False,
        )
        args = (spark, target, mv, ["event_type"], "value", "event_id")
        r1 = refresh_quantile_view(*args, k=_QVK)
        keyed_delete_where(spark, target, "event_id % 7 = 0")
        compact_keyed_table(spark, target)
        r2 = refresh_quantile_view(*args, k=_QVK)
        keyed_append(
            spark, ev.filter(F.col("event_id") % 2 == 1), target,
            key="event_id",
        )
        r3 = refresh_quantile_view(*args, k=_QVK)
        if not (
            r1["mode"] == "full"
            and r2["mode"] == "incremental"
            and r2["groups_recomputed"] > 0
            and r3["mode"] == "incremental"
            and r3["groups_recomputed"] == 0
        ):
            raise RuntimeError(
                f"quantile-view refresh modes regressed: {r1['mode']}, "
                f"{r2['mode']}/{r2['groups_recomputed']}, "
                f"{r3['mode']}/{r3['groups_recomputed']}"
            )
        qs = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
        rows = [
            (x.event_type, x.n_sample, x.p50, x.p90, x.p99)
            for x in read_quantile_view(spark, mv, qs).collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, n_sample long, p50 double, p90 double, "
        "p99 double",
    ).orderBy("event_type")


# PSI fragments shared by both drift rules: p/q smoothed through the
# SAME (count + 0.5)/(N + 0.5*B) transform (operators/expectations.py),
# so a batch matching the reference exactly scores 0.
_PSI_TERM = (
    "((coalesce(c, 0) + 0.5) / (n + 0.5 * {b})"
    " - (n * q + 0.5) / (n + 0.5 * {b}))"
    " * ln(((coalesce(c, 0) + 0.5) / (n + 0.5 * {b}))"
    "      / ((n * q + 0.5) / (n + 0.5 * {b})))"
)
_PRICE_BUCKET = (
    "CAST(CAST(o_totalprice > 50000 AS INT) + CAST(o_totalprice > 100000 "
    "AS INT) + CAST(o_totalprice > 150000 AS INT) AS VARCHAR)"
)


@query(
    "dq_drift_gate",
    f"""
    WITH refh AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
    simb AS (SELECT * FROM orders WHERE o_orderkey % 2 = 1),
    skwb AS (SELECT * FROM orders
             WHERE o_orderstatus = 'F' AND o_totalprice < 100000),
    -- categorical reference: status proportions of the even half
    sref AS (SELECT o_orderstatus AS lbl, CAST(count(*) AS DOUBLE) AS c
             FROM refh GROUP BY 1),
    sq AS (SELECT lbl, c / (SELECT sum(c) FROM sref) AS q FROM sref
           UNION ALL SELECT '__OTHER__', 0.0),
    -- numeric reference: fixed price edges, even-half proportions
    pref AS (SELECT {_PRICE_BUCKET} AS lbl, CAST(count(*) AS DOUBLE) AS c
             FROM refh GROUP BY 1),
    pq AS (SELECT lbl, c / (SELECT sum(c) FROM pref) AS q FROM pref
           UNION ALL SELECT '3', 0.0
           UNION ALL SELECT '__OTHER__', 0.0),
    pq2 AS (SELECT lbl, max(q) AS q FROM pq GROUP BY lbl),
    -- per-batch bucket counts
    s_sim AS (SELECT o_orderstatus AS lbl, count(*) AS c FROM simb GROUP BY 1),
    s_skw AS (SELECT o_orderstatus AS lbl, count(*) AS c FROM skwb GROUP BY 1),
    p_sim AS (SELECT {_PRICE_BUCKET} AS lbl, count(*) AS c FROM simb GROUP BY 1),
    p_skw AS (SELECT {_PRICE_BUCKET} AS lbl, count(*) AS c FROM skwb GROUP BY 1),
    n_sim AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM simb),
    n_skw AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM skwb),
    rows_ AS (
        SELECT 'status_drift' AS rule, 'similar' AS batch,
               sum({_PSI_TERM.format(b="(SELECT count(*) FROM sq)")}) AS psi
        FROM sq LEFT JOIN s_sim USING (lbl) CROSS JOIN n_sim
        UNION ALL
        SELECT 'status_drift', 'skewed',
               sum({_PSI_TERM.format(b="(SELECT count(*) FROM sq)")})
        FROM sq LEFT JOIN s_skw USING (lbl) CROSS JOIN n_skw
        UNION ALL
        SELECT 'price_drift', 'similar',
               sum({_PSI_TERM.format(b="(SELECT count(*) FROM pq2)")})
        FROM pq2 LEFT JOIN p_sim USING (lbl) CROSS JOIN n_sim
        UNION ALL
        SELECT 'price_drift', 'skewed',
               sum({_PSI_TERM.format(b="(SELECT count(*) FROM pq2)")})
        FROM pq2 LEFT JOIN p_skw USING (lbl) CROSS JOIN n_skw
    )
    SELECT rule, batch,
           CAST(round(psi * 1000000.0) AS BIGINT) AS micro_psi
    FROM rows_ ORDER BY rule, batch
    """,
)
def dq_drift_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift expectations (PSI) end-to-end: references
    captured from the even half of orders (categorical status
    proportions via ``reference_distribution``; fixed price bin edges
    with even-half proportions), then two probe batches — the odd half
    (same generator: PSI ≈ 0) and a deliberately skewed slice (only
    'F' orders under 100k: PSI far past the 0.1 action line).  The
    gate behavior is asserted in-query through the SAME
    ``gate_and_merge`` every load path uses: the similar batch merges
    under ``fail_thresholds={rule: 100_000}`` (micro-PSI), the skewed
    batch is rejected with zero side effects.  The oracle reproduces
    every smoothed term closed-form — micro-PSI is the output, so the
    differential checks the measure itself, not just the verdict.

    r9 extension (intentional runtime add, ~2× vs the r8 shape): the
    AMBIENT leg — the same rules stored AT a table via
    ``set_drift_policy`` (one manifest commit, rides the commit carry),
    then ``Table.maintain`` re-checks them on an undrifted table
    (passes), a drifted one (trips with zero side effects), and in
    report mode (proceeds, verdicts attached) — all asserted in-query
    on an SF-capped side table.

    100 TB shape: each rule is one batch hash-aggregate bounded by its
    bucket count plus arithmetic over ≤ B rows — the drift check adds
    batch-size-independent state to the DQ pass, and the circuit
    breaker composes with the existing expect_or_fail machinery
    unchanged.  The stored policy makes it ambient: a nightly
    ``maintain`` is one table read + the same bounded aggregates."""
    import shutil
    import tempfile

    from ..operators.expectations import (
        ExpectationFailure,
        check_expectations,
        expect_distribution,
        gate_and_merge,
        reference_distribution,
    )

    o = load_table(spark, sf_dir, "orders")
    refh = o.filter(F.col("o_orderkey") % 2 == 0)
    simb = o.filter(F.col("o_orderkey") % 2 == 1)
    skwb = o.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 100000)
    )

    status_ref = reference_distribution(refh, "o_orderstatus", top_k=8)
    edges = [50000.0, 100000.0, 150000.0]
    bucket = sum(
        (F.col("o_totalprice") > e).cast("int") for e in edges
    ).cast("string")
    counts = {
        r["b"]: r["c"]
        for r in refh.select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_ref = sum(counts.values())
    probs = [counts.get(str(i), 0) / n_ref for i in range(len(edges) + 1)]
    rules = [
        expect_distribution("status_drift", "o_orderstatus", status_ref),
        expect_distribution(
            "price_drift", "o_totalprice", edges=edges, probs=probs
        ),
    ]

    # ONE collect for both probe batches (r12, guide §1.2/§2.6): the
    # two per-batch reports union into a single action, so their
    # aggregate subtrees run concurrently in one job wave instead of
    # two sequential collects (profile_jobs: the two collects were 14
    # of this query's 85 jobs and the largest job-time block).  Output
    # rows are identical — the final frame fully orders by (rule,
    # batch), so collect order never mattered.
    labeled = [
        check_expectations(batch, rules).withColumn("__batch", F.lit(label))
        for label, batch in (("similar", simb), ("skewed", skwb))
    ]
    rows = [
        (r["rule"], r["__batch"], r["n_violations"])
        for r in labeled[0].unionByName(labeled[1]).collect()
    ]

    # the gate itself, through the real load path
    tmp = tempfile.mkdtemp(prefix="driftgate_")
    try:
        t = f"{tmp}/t"
        thresholds = {"status_drift": 100_000, "price_drift": 100_000}
        gate_and_merge(
            spark, simb, t, rules, fail_thresholds=thresholds,
            key="o_orderkey", num_buckets=4,
        )
        rejected = False
        try:
            gate_and_merge(
                spark, skwb, t, rules, fail_thresholds=thresholds,
                key="o_orderkey",
            )
        except ExpectationFailure:
            rejected = True
        if not rejected:
            raise RuntimeError("skewed batch passed the drift gate")

        # r9: the AMBIENT leg — the same rules stored AT the table
        # (one metadata commit riding the manifest carry) so
        # Table.maintain re-checks drift with nobody re-passing them.
        # A separate SF-capped table keeps this leg's cost bounded and
        # the drift magnitude sf-independent (skew merged at 4× the
        # similar slice, so the blended PSI clears 0.1 at every sf).
        from ..api import Table
        from ..sink import drift_policy, keyed_overwrite_parquet

        t2 = f"{tmp}/t2"
        sim_cap = simb.limit(2000)
        keyed_overwrite_parquet(
            spark, sim_cap, t2, key="o_orderkey", num_buckets=4
        )
        tab = Table(spark, t2)
        tab.set_drift_policy(rules, thresholds)
        # the policy survives an ordinary data commit (manifest carry)
        keyed_overwrite_parquet(spark, sim_cap, t2, key="o_orderkey")
        if drift_policy(t2) is None:
            raise RuntimeError("drift policy lost across a merge commit")
        # undrifted table: maintain passes and reports ok per rule
        rep = tab.maintain(retention_s=0.0)
        if not all(r["ok"] for r in rep["drift"]):
            raise RuntimeError(f"undrifted table tripped maintain: {rep}")
        # drift the table hard (skewed rows now dominate), then the
        # scheduled-job circuit breaker must trip BEFORE any side effect
        skew_cap = skwb.limit(2000)
        shifted = [
            skew_cap.withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.lit(10_000_000 * (i + 1)),
            )
            for i in range(2)
        ]
        storm = shifted[0]
        for s in shifted[1:]:
            storm = storm.unionByName(s)
        keyed_overwrite_parquet(spark, storm, t2, key="o_orderkey")
        tripped = False
        try:
            tab.maintain(retention_s=0.0)
        except ExpectationFailure:
            tripped = True
        if not tripped:
            raise RuntimeError("drifted table passed maintain's gate")
        # report mode proceeds and carries the per-rule verdicts
        rep2 = tab.maintain(retention_s=0.0, on_drift="report")
        if all(r["ok"] for r in rep2["drift"]):
            raise RuntimeError("report mode lost the drift verdicts")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return spark.createDataFrame(
        rows, "rule string, batch string, micro_psi long"
    ).orderBy("rule", "batch")


_CMV_D, _CMV_W = 4, 128
_CMV_SQL_C = (
    "CAST('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || event_type), 1, 15) "
    f"AS BIGINT) % {_CMV_W}"
)


@query(
    "view_cms_ivm",
    f"""
    WITH t AS (
        SELECT event_type FROM events
        WHERE ((event_id % 3 = 0 OR event_id % 3 = 1)
               AND event_id % 7 <> 0)
          AND event_type IS NOT NULL
    ),
    rows_(r) AS (SELECT unnest(range(0, {_CMV_D}))),
    ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_cnt
           FROM t GROUP BY event_type),
    cells AS (SELECT r, {_CMV_SQL_C} AS c, CAST(count(*) AS BIGINT) AS cnt
              FROM t CROSS JOIN rows_ GROUP BY 1, 2),
    pc AS (SELECT event_type, exact_cnt, r, {_CMV_SQL_C} AS c
           FROM ex CROSS JOIN rows_)
    SELECT event_type, exact_cnt,
           CAST(min(cnt) AS BIGINT) AS est_cnt,
           min(cnt) >= max(exact_cnt) AS never_under
    FROM pc JOIN cells USING (r, c)
    GROUP BY event_type, exact_cnt
    ORDER BY event_type
    """,
    rotation=False,
)
def view_cms_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min FREQUENCY view maintained by pure signed deltas
    (``views.refresh_cms_view``) — the one sketch family that is a
    LINEAR sketch, so unlike the KMV/bottom-k views even DELETES stay
    incremental: the refresh subtracts the removed files' cells through
    the same delta the append adds, no touched-group recompute
    anywhere.  Lifecycle: build → APPEND (cells add) → DELETE +
    compaction (cells subtract; unchanged rewritten rows cancel) — both
    refreshes asserted ``incremental`` in-query; the oracle rebuilds
    every surviving cell closed-form and pins the one-sided CMS error
    bound (``never_under``) inside the differential.

    100 TB shape: view state is ≤ depth·width cells per group whatever
    the data size; a refresh reads only commit-touched files, and the
    hot path (streaming event counts with retention deletes) never
    rescans history."""
    import shutil
    import tempfile

    from ..sink import (
        compact_keyed_table,
        keyed_append,
        keyed_delete_where,
        keyed_overwrite_parquet,
        read_keyed_table,
    )
    from ..views import read_cms_view, refresh_cms_view

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    tmp = tempfile.mkdtemp(prefix="cmsivm_")
    try:
        target, mv = f"{tmp}/t", f"{tmp}/mv"
        keyed_overwrite_parquet(
            spark, ev.filter(F.col("event_id") % 3 == 0), target,
            key="event_id", num_buckets=8, vacuum=False,
        )
        args = (spark, target, mv, [], "event_type")
        r1 = refresh_cms_view(*args, depth=_CMV_D, width=_CMV_W)
        keyed_append(
            spark, ev.filter(F.col("event_id") % 3 == 1), target,
            key="event_id",
        )
        r2 = refresh_cms_view(*args, depth=_CMV_D, width=_CMV_W)
        keyed_delete_where(spark, target, "event_id % 7 = 0")
        compact_keyed_table(spark, target)
        r3 = refresh_cms_view(*args, depth=_CMV_D, width=_CMV_W)
        if not (
            r1["mode"] == "full"
            and r2["mode"] == "incremental"
            and r3["mode"] == "incremental"
        ):
            raise RuntimeError(
                "cms-view refresh modes regressed: "
                f"{r1['mode']}, {r2['mode']}, {r3['mode']}"
            )
        final = read_keyed_table(spark, target).filter(
            F.col("event_type").isNotNull()
        )
        exact = final.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("exact_cnt")
        )
        est = read_cms_view(spark, mv, exact.select("event_type"))
        rows = [
            (x.event_type, x.exact_cnt, x.est_cnt, x.never_under)
            for x in exact.join(est, "event_type")
            .select(
                "event_type",
                "exact_cnt",
                "est_cnt",
                (F.col("est_cnt") >= F.col("exact_cnt")).alias("never_under"),
            )
            .collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, exact_cnt long, est_cnt long, never_under boolean",
    ).orderBy("event_type")


@query(
    "table_rename_drop",
    """
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice AS price
        FROM orders
    ),
    surv AS (SELECT * FROM base WHERE NOT (price < 50000)),
    upd AS (
        SELECT o_orderstatus,
               CASE WHEN o_custkey % 10 = 0 THEN price * 2
                    ELSE price END AS price
        FROM surv
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(price) AS BIGINT)) AS BIGINT) AS sum_price
    FROM upd GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def table_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only schema evolution end-to-end: RENAME COLUMN and
    DROP COLUMN as single manifest commits (``sink.rename_column`` /
    ``drop_column`` — files keep their physical names; the mapping
    relabels at the read/write boundary), then every write surface
    speaks the NEW names: a CoW merge inserts the second half of orders
    with a ``price`` column, DELETE and UPDATE predicates bind
    logically, compaction folds the deltas, and the final readout
    aggregates the renamed column.  Time-travel name exactness and the
    fail-closed gate on non-mapping-aware ops are asserted in-query;
    the oracle reproduces the final state closed-form from orders.

    100 TB shape: the rename/drop are one manifest CAS each — zero
    data moves on a table of any size (a rewrite-rename of a wide fact
    table is a full-table job; this is the Delta column-mapping /
    Iceberg field-id answer re-expressed on this format)."""
    import shutil
    import tempfile

    from ..sink import (
        compact_keyed_table,
        drop_column,
        keyed_delete_where,
        keyed_overwrite_parquet,
        keyed_update_where,
        merge_into,
        read_keyed_table,
        rename_column,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    tmp = tempfile.mkdtemp(prefix="renamedrop_")
    try:
        t = f"{tmp}/t"
        keyed_overwrite_parquet(
            spark, o.filter(F.col("o_orderkey") % 2 == 0), t,
            key="o_orderkey", num_buckets=8,
            stats_cols=["o_totalprice"], vacuum=False,
        )
        rename_column(spark, t, "o_totalprice", "price")
        drop_column(spark, t, "o_orderpriority")
        keyed_overwrite_parquet(
            spark,
            o.filter(F.col("o_orderkey") % 2 == 1)
            .withColumnRenamed("o_totalprice", "price")
            .drop("o_orderpriority"),
            t, key="o_orderkey", vacuum=False,
        )
        keyed_delete_where(spark, t, "price < 50000")
        keyed_update_where(
            spark, t, {"price": "price * 2"}, "o_custkey % 10 = 0"
        )
        compact_keyed_table(spark, t)
        cur = read_keyed_table(spark, t)
        v1 = read_keyed_table(spark, t, version=1)
        gate_ok = False
        try:
            merge_into(
                spark, t,
                cur.limit(1).select("o_orderkey", "price"),
                when_matched_update={"price": "price"},
            )
        except ValueError:
            gate_ok = True
        if not (
            "price" in cur.columns
            and "o_totalprice" not in cur.columns
            and "o_orderpriority" not in cur.columns
            and "o_totalprice" in v1.columns
            and gate_ok
        ):
            raise RuntimeError(
                "column-mapping contract regressed: "
                f"cur={cur.columns} v1={v1.columns} gate={gate_ok}"
            )
        rows = [
            (x.o_orderstatus, x.n, x.sum_price)
            for x in cur.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.floor("price").cast("long"))
                .cast("long")
                .alias("sum_price"),
            )
            .collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "o_orderstatus string, n long, sum_price long"
    ).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# Line-level boilerplate removal (CCNet / RefinedWeb pass) — the corpus
# has no newlines, so the query derives a deterministic multi-line form
# first (3-token lines), then runs operators.dedup.remove_duplicate_lines:
# one count shuffle on the 60-bit line hash (partial agg collapses the
# repeats map-side), the heavy dictionary BROADCASTS into the anti-join,
# and reassembly groups on doc_id.  The oracle rebuilds the identical
# lines and counts the literal strings (hash-free — collision odds at
# 60 bits are the documented non-risk).
# ---------------------------------------------------------------------------
@query(
    "pipeline_line_dedup",
    f"""
    WITH w AS (SELECT doc_id, {SQL_TOKS} AS w FROM documents),
    l AS (
        SELECT doc_id, i AS pos,
               array_to_string(w[(i-1)*3+1:(i-1)*3+3], ' ') AS line
        FROM w, unnest(generate_series(1, CAST(ceil(len(w) / 3.0) AS BIGINT))) AS t(i)
    ),
    h AS (
        -- blank = ALL-whitespace (regexp, mirroring the Spark side's
        -- \\s trim rule; DuckDB trim() strips 0x20 only, same as Spark's)
        SELECT line FROM l
        WHERE regexp_replace(line, '^\\s+|\\s+$', '', 'g') <> ''
        GROUP BY line HAVING count(*) >= 2
    ),
    k AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM h)),
    r AS (
        SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_fp
        FROM k GROUP BY doc_id
    ),
    n AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id)
    SELECT n.doc_id,
           n.n_lines,
           coalesce(r.n_kept, 0) AS n_kept,
           coalesce(r.clean_fp, md5('')) AS clean_fp
    FROM n LEFT JOIN r USING (doc_id)
    """,
)
def pipeline_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = X.tokens_expr()
    n_lines = F.ceil(F.size(w) / F.lit(3.0)).cast("int")
    line_arr = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.array_join(F.slice(w, (i - 1) * 3 + 1, 3), " "),
    )
    # zero-token docs are EXCLUDED to match the oracle: its
    # generate_series(1, ceil(0/3)) emits no line rows, so the doc is
    # absent from `n` — while array_join('', split) here would round-trip
    # to a single '' line and emit the doc with n_lines=1 (latent
    # differential mismatch flagged by the r7 advisor)
    multiline = docs.filter(F.size(w) > 0).select(
        "doc_id", F.array_join(line_arr, "\n").alias("text")
    )
    return D.remove_duplicate_lines(multiline, min_dup=2)


# ---------------------------------------------------------------------------
# Write-Audit-Publish end to end (sink.wap_begin/wap_publish,
# Table.branch/publish): the oracle reproduces the final state
# closed-form over `orders`, proving (a) a gated load lands atomically
# via the metadata-only fast-forward, (b) a FAILED audit publishes
# nothing (the bump below is visible exactly once), (c) the blocked
# branch is abandonable while the published one persists.  In-query
# RuntimeErrors pin the control-flow invariants the scalar outputs
# can't (audit raised, state unchanged after the block).
#
# 100 TB shape: begin is a shallow clone (zero data moved), audit runs
# expectation rules over the branch state, publish is ONE CAS; only
# adopt_foreign ever copies bytes, and only the newly-loaded files.
# ---------------------------------------------------------------------------
@query(
    "table_wap_publish",
    """
    SELECT 'count_total' AS name, count(*) AS val FROM orders
    UNION ALL
    SELECT 'n_branches', 1 FROM (SELECT 1)
    UNION ALL
    SELECT 'sum_custkey_published',
           CAST(sum(o_custkey
                    + CASE WHEN o_orderkey % 100 = 0 THEN 1000000 ELSE 0 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'version_final', 2 FROM (SELECT 1)
    ORDER BY name
    """,
)
def table_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..api import Engine
    from ..operators.expectations import expect

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    tmp = tempfile.mkdtemp(prefix="wap_")
    try:
        t = Engine(spark).table(f"{tmp}/t")
        t.merge(o, key="o_orderkey", num_buckets=8, vacuum=False)

        # the audited load: bump custkey for 100-divisible orders
        b = t.branch("gated")
        b.merge(
            o.filter(F.col("o_orderkey") % 100 == 0).withColumn(
                "o_custkey", F.col("o_custkey") + F.lit(1000000)
            ),
            key="o_orderkey",
        )
        t.publish("gated", expectations=[expect("ck_pos", "o_custkey >= 0")])

        # the blocked load: audit must refuse negative keys, atomically
        bad = t.branch("blocked")
        bad.merge(
            o.limit(50).withColumn("o_custkey", F.lit(-1).cast("long")),
            key="o_orderkey",
        )
        sum_before = t.read().agg(F.sum("o_custkey")).first()[0]
        try:
            t.publish("blocked", expectations=[expect("ck_pos", "o_custkey >= 0")])
            raise RuntimeError("blocked publish must fail its audit")
        except ValueError:
            pass
        if t.read().agg(F.sum("o_custkey")).first()[0] != sum_before:
            raise RuntimeError("failed audit leaked data into the source")
        t.abandon("blocked")

        rows = [
            ("count_total", t.read().count()),
            ("n_branches", len(t.branches())),
            ("sum_custkey_published", sum_before),
            ("version_final", t.version()),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "name string, val long").orderBy("name")


# ---------------------------------------------------------------------------
# Geospatial radius join (operators/geo.py).  The corpus has no
# coordinates, so each customer/supplier gets a deterministic md5-derived
# point in the +-60deg band (the PII-injection convention).  The ORACLE
# is the brute-force cross join — the differential proves the grid-
# bucketed plan (cell equi-join + 3x3 neighbor explode on the 100x
# smaller supplier side + exact haversine filter) reproduces the naive
# O(|C|x|S|) semantics without ever building the cross product
# (tests/test_geo.py pins CartesianProduct out of the plan).
# ---------------------------------------------------------------------------
def _geo_sql_point(key: str, prefix: str) -> tuple[str, str]:
    lat = (
        f"(CAST('0x' || substr(md5('lat{prefix}:' || {key}), 1, 15) AS BIGINT)"
        f" % 120000000) / 1000000.0 - 60.0"
    )
    lon = (
        f"(CAST('0x' || substr(md5('lon{prefix}:' || {key}), 1, 15) AS BIGINT)"
        f" % 360000000) / 1000000.0 - 180.0"
    )
    return lat, lon


_GEO_C_LAT, _GEO_C_LON = _geo_sql_point("c_custkey", "c")
_GEO_S_LAT, _GEO_S_LON = _geo_sql_point("s_suppkey", "s")


@query(
    "q_geo_radius_join",
    f"""
    WITH c AS (
        SELECT c_custkey, {_GEO_C_LAT} AS lat, {_GEO_C_LON} AS lon
        FROM customer
    ),
    s AS (
        SELECT s_suppkey, {_GEO_S_LAT} AS lat, {_GEO_S_LON} AS lon
        FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           round(2 * 6371.0 * asin(sqrt(
               sin(radians(s.lat - c.lat) / 2) * sin(radians(s.lat - c.lat) / 2)
               + cos(radians(c.lat)) * cos(radians(s.lat))
               * sin(radians(s.lon - c.lon) / 2) * sin(radians(s.lon - c.lon) / 2)
           )), 6) AS dist_km
    FROM c, s
    WHERE round(2 * 6371.0 * asin(sqrt(
               sin(radians(s.lat - c.lat) / 2) * sin(radians(s.lat - c.lat) / 2)
               + cos(radians(c.lat)) * cos(radians(s.lat))
               * sin(radians(s.lon - c.lon) / 2) * sin(radians(s.lon - c.lon) / 2)
          )), 6) <= 500.0
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import geo

    def _point(df, key, prefix):
        h = lambda tag: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{tag}{prefix}:"), F.col(key))), 1, 15
                ),
                16, 10,
            ).cast("long")
        )
        return df.select(
            key,
            ((h("lat") % 120000000) / 1000000.0 - 60.0).alias("lat"),
            ((h("lon") % 360000000) / 1000000.0 - 180.0).alias("lon"),
        )

    c = _point(load_table(spark, sf_dir, "customer"), "c_custkey", "c")
    s = _point(load_table(spark, sf_dir, "supplier"), "s_suppkey", "s")
    return geo.radius_join(c, s, 500.0).select(
        "c_custkey", F.col("s_suppkey_r").alias("s_suppkey"), "dist_km"
    )


# ---------------------------------------------------------------------------
# Markup stripping (operators/text.py strip_markup_expr).  The corpus is
# plain text, so each document is first wrapped in a deterministic HTML
# shell (style+script payloads, headings, paragraphs, comments, entities
# — all derived from doc_id, the PII-injection convention); the oracle
# rebuilds the identical shell and mirrors the regex chain step for
# step (same patterns, same order, RE2-safe: no backreferences).
# ---------------------------------------------------------------------------
_HTML_SHELL_SQL = (
    "'<html><head><style>body { color: red }</style>"
    "<script>if (1<2) { alert(\"x&y\"); }</script></head>"
    "<body><h1>Doc ' || doc_id || '</h1><p>' || text || '</p>"
    "<!-- hidden ' || doc_id || ' --><div>tail &amp; &lt;end&gt; of "
    "' || doc_id || ' (code: &amp;lt;b&amp;gt;)</div></body></html>'"
)


@query(
    "text_strip_markup",
    f"""
    WITH h AS (SELECT doc_id, {_HTML_SHELL_SQL} AS t FROM documents),
    s AS (
        SELECT doc_id,
          trim(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  replace(replace(replace(replace(replace(replace(replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(t,
                              '(?is)<script\\b[^>]*>.*?</script>', '', 'g'),
                            '(?is)<style\\b[^>]*>.*?</style>', '', 'g'),
                          '(?s)<!--.*?-->', '', 'g'),
                        '(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote)>|<br\\s*/?>',
                        chr(10), 'g'),
                      '(?s)<[^>]+>', ' ', 'g'),
                    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                    '&quot;', '"'), '&#39;', chr(39)), '&apos;', chr(39)),
                    '&amp;', '&'),
                  '[ \\t\\r]+', ' ', 'g'),
                ' ?' || chr(10) || ' ?', chr(10), 'g'),
              chr(10) || '{{3,}}', chr(10) || chr(10), 'g')
          ) AS clean
        FROM h
    )
    SELECT doc_id,
           length(trim(clean, chr(10))) AS n_chars_clean,
           md5(trim(clean, chr(10))) AS clean_fp
    FROM s
    """,
)
def text_strip_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shell = F.concat(
        F.lit(
            '<html><head><style>body { color: red }</style>'
            '<script>if (1<2) { alert("x&y"); }</script></head>'
            "<body><h1>Doc "
        ),
        F.col("doc_id"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><!-- hidden "),
        F.col("doc_id"),
        F.lit(" --><div>tail &amp; &lt;end&gt; of "),
        F.col("doc_id"),
        # double-escaped entities pin the decode ORDER: &amp; decodes
        # LAST, so '&amp;lt;b&amp;gt;' must surface as the literal
        # '&lt;b&gt;', never double-decode to '<b>' (r7 advisor)
        F.lit(" (code: &amp;lt;b&amp;gt;)</div></body></html>"),
    )
    clean = X.strip_markup_expr(shell)
    return docs.select(
        "doc_id",
        F.length(clean).cast("long").alias("n_chars_clean"),
        F.md5(clean).alias("clean_fp"),
    )


# ---------------------------------------------------------------------------
# In-engine model training (operators/ml.py): logistic regression by
# full-batch gradient descent over integer stopword-count features,
# label = (lang == 'en').  One map-side-combinable aggregate per
# iteration, weights re-enter as literals — MLlib's treeAggregate shape
# in plain DataFrame ops.  The oracle UNROLLS the three iterations as
# CTEs; the integer micro-unit scheme (exact BIGINT margins/gradients,
# sigmoid floored BEFORE summation) makes every intermediate hash-exact
# across engines.
#
# Honest-outcome note: this corpus's `lang` column is metadata (the text
# is a shared word soup), so the stopword features carry no label signal
# and the CORRECT converged model is the majority prior — the
# differential pins the training machinery, not model quality;
# tests/test_ml.py proves the same learner reaches 100% on separable
# data with the expected weight signs.
# ---------------------------------------------------------------------------
_LR_LANGS = list(X.LANG_STOPWORDS)
_LR_ITERS = 3
_LR_INV = 8


def _lr_oracle_sql() -> str:
    feats = ", ".join(f"{_SQL_STOP_HITS[l]} AS x_{l}" for l in _LR_LANGS)
    sql = (
        "WITH t AS (SELECT doc_id,"
        " CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, "
        + feats
        + f" FROM (SELECT doc_id, lang, {SQL_TOKS} AS toks FROM documents)),\n"
        "nn AS (SELECT count(*) AS n FROM t),\n"
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w_{l}" for l in _LR_LANGS)
        + ", CAST(0 AS BIGINT) AS w_bias),\n"
    )
    for i in range(1, _LR_ITERS + 1):
        margin = " + ".join(f"w_{l} * x_{l}" for l in _LR_LANGS) + " + w_bias"
        sql += (
            f"p{i} AS (SELECT t.*, CAST(floor(1000000.0 / (1.0 + "
            f"exp(-({margin}) / 1000000.0))) AS BIGINT) AS p "
            f"FROM t CROSS JOIN w{i - 1}),\n"
            f"g{i} AS (SELECT "
            + ", ".join(
                f"CAST(sum((p - y * 1000000) * x_{l}) AS BIGINT) AS g_{l}"
                for l in _LR_LANGS
            )
            + ", CAST(sum(p - y * 1000000) AS BIGINT) AS g_bias "
            f"FROM p{i}),\n"
            f"w{i} AS (SELECT "
            + ", ".join(
                f"w_{l} - CAST(floor(g_{l} / ({_LR_INV}.0 * n)) AS BIGINT)"
                f" AS w_{l}"
                for l in _LR_LANGS
            )
            + f", w_bias - CAST(floor(g_bias / ({_LR_INV}.0 * n)) AS BIGINT)"
            f" AS w_bias FROM g{i} CROSS JOIN w{i - 1} CROSS JOIN nn),\n"
        )
    final_margin = (
        " + ".join(f"w_{l} * x_{l}" for l in _LR_LANGS) + " + w_bias"
    )
    sql += (
        f"m AS (SELECT t.*, ({final_margin}) AS margin "
        f"FROM t CROSS JOIN w{_LR_ITERS})\n"
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(
            f"SELECT 'w_{l}' AS name, w_{l} AS val FROM w{_LR_ITERS}"
            for l in _LR_LANGS
        )
        + f"\nUNION ALL\nSELECT 'w_bias', w_bias FROM w{_LR_ITERS}"
        "\nUNION ALL\nSELECT 'n_correct', CAST(sum(CASE WHEN "
        "(CASE WHEN margin > 0 THEN 1 ELSE 0 END) = y THEN 1 ELSE 0 END)"
        " AS BIGINT) FROM m"
        "\nUNION ALL\nSELECT 'n_docs', n FROM nn\n"
        ") ORDER BY name"
    )
    return sql


@query("pipeline_train_logreg", _lr_oracle_sql())
def pipeline_train_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ml import logreg_predictions, train_logreg_gd

    docs = load_table(spark, sf_dir, "documents")
    cols = [
        X.stopword_hits_expr(lang).cast("long").alias(f"x_{lang}")
        for lang in _LR_LANGS
    ]
    feats = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        *cols,
    )
    model = train_logreg_gd(
        feats, [f"x_{l}" for l in _LR_LANGS],
        iterations=_LR_ITERS, lr_inv=_LR_INV,
    )
    scored = logreg_predictions(feats, model)
    correct = scored.agg(
        F.sum((F.col("pred") == F.col("y")).cast("long")).alias("c")
    ).first()["c"]
    rows = [
        *[(f"w_{l}", model["weights"][f"x_{l}"]) for l in _LR_LANGS],
        ("w_bias", model["bias"]),
        ("n_correct", correct),
        ("n_docs", model["n"]),
    ]
    return spark.createDataFrame(rows, "name string, val long").orderBy("name")


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (operators/unigram.py — the SentencePiece family,
# completing the tokenizer surface next to BPE learn/encode).  The
# oracle embeds the SAME generated Viterbi unrolling (dp_select_exprs
# emits both dialects from one spec), so the differential pins the full
# chain: substring vocab -> micro-nat costs -> exact-BIGINT DP ->
# reconstruction -> hard-EM usage counts.
# ---------------------------------------------------------------------------
def _unigram_oracle_sql() -> str:
    from ..operators.unigram import L_MAX, P_MAX, VOCAB_K, dp_layers

    # one MATERIALIZED CTE per DP layer: DuckDB (like Spark's
    # CollapseProject) inlines lateral aliases by substitution, so the
    # flat unrolling is exponential in the binder — materializing each
    # layer keeps every alias bound exactly once (the oracle-side twin
    # of the Spark operator's chained selects + lineage cut)
    layers = dp_layers("duckdb")
    ctes = ["seg_0 AS MATERIALIZED (SELECT word, freq, __pm, "
            + ", ".join(layers[0]) + " FROM words CROSS JOIN m)"]
    for idx, layer in enumerate(layers[1:], start=1):
        ctes.append(
            f"seg_{idx} AS MATERIALIZED (SELECT *, "
            + ", ".join(layer) + f" FROM seg_{idx - 1})"
        )
    seg_ctes = ",\n    ".join(ctes)
    last = len(layers) - 1
    return f"""
    WITH words AS (
        SELECT word, count(*) AS freq
        FROM (SELECT unnest({SQL_TOKS}) AS word FROM documents)
        WHERE length(word) <= {L_MAX}
        GROUP BY word
    ),
    subs AS (
        SELECT freq,
               unnest(flatten(list_transform(
                   generate_series(1, length(word)),
                   s -> list_transform(
                       generate_series(1, least({P_MAX}, length(word) - s + 1)),
                       l -> substr(word, s, l))))) AS piece
        FROM words
    ),
    counts AS (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM subs GROUP BY piece
    ),
    ranked AS (
        SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS r
        FROM counts
    ),
    kept AS (
        SELECT piece, cnt FROM ranked WHERE r <= {VOCAB_K} OR length(piece) = 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM kept),
    costs AS (
        SELECT piece,
               CAST(floor(1000000.0 * ln(total * 1.0 / cnt)) AS BIGINT) AS cost
        FROM kept CROSS JOIN tot
    ),
    m AS (SELECT map_from_entries(list((piece, cost))) AS __pm FROM costs),
    {seg_ctes},
    used AS (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS used_cnt
        FROM (SELECT freq, unnest(pieces) AS piece FROM seg_{last})
        GROUP BY piece
    )
    SELECT piece, used_cnt FROM used ORDER BY used_cnt DESC, piece LIMIT 30
    """


@query("pipeline_unigram_tokenize", _unigram_oracle_sql())
def pipeline_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import unigram_piece_usage

    docs = load_table(spark, sf_dir, "documents")
    return (
        unigram_piece_usage(docs)
        .orderBy(F.desc("used_cnt"), "piece")
        .limit(30)
    )


# The nearest-neighbor companion (geo.nearest_join): per customer, the
# closest supplier within 500 km — argmin as ONE struct-min aggregate
# over the grid candidates (total order => deterministic tie-break:
# dist, then supplier key).  Oracle = brute-force row_number argmin
# with the identical ordering.
@query(
    "q_geo_nearest",
    f"""
    WITH c AS (
        SELECT c_custkey, {_GEO_C_LAT} AS lat, {_GEO_C_LON} AS lon
        FROM customer
    ),
    s AS (
        SELECT s_suppkey, {_GEO_S_LAT} AS lat, {_GEO_S_LON} AS lon
        FROM supplier
    ),
    pairs AS (
        SELECT c.c_custkey, s.s_suppkey,
               round(2 * 6371.0 * asin(sqrt(
                   sin(radians(s.lat - c.lat) / 2) * sin(radians(s.lat - c.lat) / 2)
                   + cos(radians(c.lat)) * cos(radians(s.lat))
                   * sin(radians(s.lon - c.lon) / 2) * sin(radians(s.lon - c.lon) / 2)
               )), 6) AS dist_km
        FROM c, s
    )
    SELECT c_custkey, s_suppkey, dist_km FROM (
        SELECT *, row_number() OVER (
            PARTITION BY c_custkey ORDER BY dist_km, s_suppkey
        ) AS rn
        FROM pairs WHERE dist_km <= 500.0
    ) WHERE rn = 1
    """,
)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import geo

    def _point(df, key, prefix):
        h = lambda tag: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{tag}{prefix}:"), F.col(key))), 1, 15
                ),
                16, 10,
            ).cast("long")
        )
        return df.select(
            key,
            ((h("lat") % 120000000) / 1000000.0 - 60.0).alias("lat"),
            ((h("lon") % 360000000) / 1000000.0 - 180.0).alias("lon"),
        )

    c = _point(load_table(spark, sf_dir, "customer"), "c_custkey", "c")
    s = _point(load_table(spark, sf_dir, "supplier"), "s_suppkey", "s")
    return geo.nearest_join(c, s, 500.0, "c_custkey").select(
        "c_custkey", F.col("s_suppkey_r").alias("s_suppkey"), "dist_km"
    )


# The unigram APPLY step: per-document piece counts under the learned
# vocab — one corpus join against the broadcast word->pieces table
# (everything heavy was already pinned by pipeline_unigram_tokenize's
# differential; this one pins the encode aggregation and the over-L_MAX
# <unk> pass-through).
def _unigram_encode_oracle_sql() -> str:
    from ..operators.unigram import L_MAX

    base = _unigram_oracle_sql()
    head, _tail = base.rsplit("SELECT piece, used_cnt", 1)
    return (
        head
        + f""", wp AS (SELECT word, len(pieces) AS np FROM seg_{_unigram_seg_last()}),
    ex AS (
        SELECT doc_id, unnest({SQL_TOKS}) AS word FROM documents
    )
    SELECT ex.doc_id,
           count(*) AS n_words,
           CAST(sum(coalesce(wp.np, 1)) AS BIGINT) AS n_pieces,
           CAST(sum(length(ex.word)) AS BIGINT) AS n_chars_encoded
    FROM ex LEFT JOIN wp USING (word)
    GROUP BY ex.doc_id
    """
    )


def _unigram_seg_last() -> int:
    from ..operators.unigram import dp_layers

    return len(dp_layers("duckdb")) - 1


@query(
    "pipeline_unigram_encode",
    _unigram_encode_oracle_sql(),
    rotation=False,
)
def pipeline_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import unigram_encode

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_encode(docs)


# One FULL hard-EM round (operators/unigram.py unigram_piece_usage_em):
# the oracle repeats the layered seg chain under the re-estimated map.
def _unigram_seg_chain(prefix: str, map_cte: str) -> str:
    from ..operators.unigram import dp_layers

    layers = dp_layers("duckdb")
    ctes = [
        f"{prefix}_0 AS MATERIALIZED (SELECT word, freq, __pm, "
        + ", ".join(layers[0])
        + f" FROM words CROSS JOIN {map_cte})"
    ]
    for idx, layer in enumerate(layers[1:], start=1):
        ctes.append(
            f"{prefix}_{idx} AS MATERIALIZED (SELECT *, "
            + ", ".join(layer)
            + f" FROM {prefix}_{idx - 1})"
        )
    return ",\n    ".join(ctes)


def _unigram_em_oracle_sql() -> str:
    base = _unigram_oracle_sql()
    head, _tail = base.rsplit("SELECT piece, used_cnt", 1)
    last = _unigram_seg_last()
    return (
        head
        + f""",
    chars AS (SELECT piece FROM kept WHERE length(piece) = 1),
    sm AS (
        SELECT piece, used_cnt AS cnt FROM used
        UNION ALL
        SELECT c.piece, CAST(1 AS BIGINT) FROM chars c
        WHERE c.piece NOT IN (SELECT piece FROM used)
    ),
    tot2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM sm),
    costs2 AS (
        SELECT piece,
               CAST(floor(1000000.0 * ln(total * 1.0 / cnt)) AS BIGINT) AS cost
        FROM sm CROSS JOIN tot2
    ),
    m2 AS (SELECT map_from_entries(list((piece, cost))) AS __pm FROM costs2),
    {_unigram_seg_chain("em", "m2")},
    used1 AS (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS used_cnt
        FROM (SELECT freq, unnest(pieces) AS piece FROM em_{last})
        GROUP BY piece
    )
    SELECT piece, used_cnt FROM used1 ORDER BY used_cnt DESC, piece LIMIT 30
    """
    )


@query("pipeline_unigram_em", _unigram_em_oracle_sql())
def pipeline_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import unigram_piece_usage_em

    docs = load_table(spark, sf_dir, "documents")
    return (
        unigram_piece_usage_em(docs)
        .orderBy(F.desc("used_cnt"), "piece")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Hard-EM iterated to a FIXED POINT (VERDICT r7 task 6): the training
# curve itself is the query result — per round, the vocab size and the
# corpus negative log-likelihood in exact integer micro-nats
# (sum over distinct words of freq * Viterbi-total-cost).  Non-increasing
# and exactly stationary once segmentations stop changing (measured: the
# fixture corpora reach the fixed point by round 2); the monotonicity
# invariant is pinned in tests/test_unigram_em.py.  The oracle unrolls
# every round: K+1 generated Viterbi chains with the re-estimation CTEs
# between them — all integer arithmetic, so the curve is hash-exact.
# ---------------------------------------------------------------------------
_EM_CURVE_ROUNDS = 3


def _unigram_em_curve_oracle_sql(rounds: int = _EM_CURVE_ROUNDS) -> str:
    base = _unigram_oracle_sql()
    head = base[: base.index("seg_0 AS MATERIALIZED")]
    last = _unigram_seg_last()
    parts = [head.rstrip().rstrip(",")]
    parts.append(",\n    chars AS (SELECT piece FROM kept WHERE length(piece) = 1)")
    stats = []
    for r in range(rounds + 1):
        cost_cte = "costs" if r == 0 else f"costs_r{r}"
        map_cte = "m" if r == 0 else f"m_r{r}"
        if r > 0:
            parts.append(
                f""",
    used_r{r} AS (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS used_cnt
        FROM (SELECT freq, unnest(pieces) AS piece FROM s{r - 1}_{last})
        GROUP BY piece
    ),
    sm_r{r} AS (
        SELECT piece, used_cnt AS cnt FROM used_r{r}
        UNION ALL
        SELECT c.piece, CAST(1 AS BIGINT) FROM chars c
        WHERE c.piece NOT IN (SELECT piece FROM used_r{r})
    ),
    tot_r{r} AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM sm_r{r}),
    {cost_cte} AS (
        SELECT piece,
               CAST(floor(1000000.0 * ln(total * 1.0 / cnt)) AS BIGINT) AS cost
        FROM sm_r{r} CROSS JOIN tot_r{r}
    ),
    {map_cte} AS (SELECT map_from_entries(list((piece, cost))) AS __pm FROM {cost_cte})"""
            )
        parts.append(",\n    " + _unigram_seg_chain(f"s{r}", map_cte))
        stats.append(
            f"SELECT {r} AS round, "
            f"(SELECT count(*) FROM {cost_cte}) AS vocab_size, "
            f"CAST(sum(freq * wcost) AS BIGINT) AS corpus_cost_micro "
            f"FROM s{r}_{last}"
        )
    parts.append("\n    " + "\n    UNION ALL\n    ".join(stats))
    parts.append("\n    ORDER BY round")
    return "".join(parts)


@query(
    "pipeline_unigram_em_curve",
    _unigram_em_curve_oracle_sql(),
    rotation=False,
)
def pipeline_unigram_em_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import unigram_em_curve

    docs = load_table(spark, sf_dir, "documents")
    return unigram_em_curve(docs, rounds=_EM_CURVE_ROUNDS).orderBy("round")


# ---------------------------------------------------------------------------
# The line-dedup SORT-MERGE branch as its own driver-checked query: the
# gate (dedup.remove_duplicate_lines broadcast_threshold) picks a join
# strategy by dictionary size, and a strategy the correctness gate never
# exercises is a strategy that can rot — so the big-corpus branch gets
# an independent differential row against the SAME oracle (forced via
# threshold=0; plan pinned SortMergeJoin in tests/test_line_dedup.py).
# ---------------------------------------------------------------------------
from .queries import ORACLE as _ORACLE  # noqa: E402  (after registration above)


@query(
    "pipeline_line_dedup_sortmerge",
    _ORACLE["pipeline_line_dedup"],
    rotation=False,
)
def pipeline_line_dedup_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = X.tokens_expr()
    n_lines = F.ceil(F.size(w) / F.lit(3.0)).cast("int")
    line_arr = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.array_join(F.slice(w, (i - 1) * 3 + 1, 3), " "),
    )
    multiline = docs.filter(F.size(w) > 0).select(
        "doc_id", F.array_join(line_arr, "\n").alias("text")
    )
    return D.remove_duplicate_lines(multiline, min_dup=2, broadcast_threshold=0)
