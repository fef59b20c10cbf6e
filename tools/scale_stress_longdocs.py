"""Long-document stress for the text stack: token stats, Gopher-style
repetition signals, minhash shingling, TF-IDF — at 1k/10k/100k tokens per
document.

Web corpora are dominated by short documents, but the tail (books, code
dumps, concatenated crawls) reaches 100k+ tokens, and the text operators'
intermediate SHAPE changes with document length: per-row token/shingle
ARRAYS grow to ~100k elements (single-row memory), and the explode
fan-out becomes 100k rows per input row.  This probe measures where (or
whether) that cliffs on the real operators.

Documents are synthesized JVM-side (sequence/transform/xxhash64 — no
Python, no driver loop): `n_tokens` tokens drawn deterministically from a
50k vocabulary keyed on (doc_id, position), so every run is reproducible
and aggregate shapes (distinct ratios, bigram dup rates) are realistic
rather than degenerate.

Usage: python tools/scale_stress_longdocs.py [n_tokens ...] (default:
1000 10000 100000; 64 docs each).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from airflow_postgres_etl_spark.operators import dedup as D  # noqa: E402
from airflow_postgres_etl_spark.operators import text as X  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402

N_DOCS = 64
VOCAB = 50_000


def long_docs(spark, n_tokens: int):
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("tok"),
        F.pmod(F.xxhash64(F.col("doc_id") * 1_000_003 + i), F.lit(VOCAB)),
    )
    return (
        spark.range(N_DOCS)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .withColumn(
            "text",
            F.array_join(F.transform(F.sequence(F.lit(1), F.lit(n_tokens)), tok), " "),
        )
    )


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 100_000]
    spark = get_spark(app_name="scale_stress_longdocs")
    results = []
    for n_tokens in sizes:
        docs = long_docs(spark, n_tokens).persist()
        docs.count()  # materialize the synthesis outside the timings

        # 1. token stats: pure per-row expressions, no explode
        _, t_stats = timed(
            lambda: docs.select(
                X.token_count_expr().alias("n"),
                F.size(X.distinct_tokens_expr()).alias("u"),
            ).agg(F.sum("n"), F.sum("u")).collect()
        )

        # 2. repetition: bigram explode -> (doc, bigram) agg -> doc agg
        w = docs.select("doc_id", X.tokens_expr().alias("w"))
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
        _, t_rep = timed(
            lambda: per.groupBy("doc_id")
            .agg((1 - F.count("*") / F.sum("c")).alias("dup"))
            .agg(F.avg("dup"))
            .collect()
        )

        # 3. minhash signatures: shingle arrays (~n_tokens elements/row),
        #    explode, 12-way min-agg
        _, t_minhash = timed(lambda: D.minhash_signatures(docs).count())
        spark.catalog.clearCache()  # release the registered shingle cache

        # 4. tf-idf: token explode -> tf -> df join -> top-3 window
        toks = docs.select("doc_id", F.explode(X.tokens_expr()).alias("term"))
        tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        tfidf = tf.join(dfreq, "term").withColumn(
            "tfidf", F.col("tf") * (F.log((N_DOCS + 1.0) / (F.col("df") + 1.0)) + 1.0)
        )
        wnd = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
        _, t_tfidf = timed(
            lambda: tfidf.withColumn("r", F.row_number().over(wnd))
            .filter(F.col("r") <= 3)
            .count()
        )

        docs.unpersist()
        results.append(
            {
                "n_tokens": n_tokens,
                "n_docs": N_DOCS,
                "total_tokens": n_tokens * N_DOCS,
                "t_token_stats_sec": t_stats,
                "t_repetition_sec": t_rep,
                "t_minhash_sec": t_minhash,
                "t_tfidf_sec": t_tfidf,
            }
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"metric": "scale_stress_longdocs", "rows": results}))


if __name__ == "__main__":
    main()
