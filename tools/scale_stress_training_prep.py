"""Training-prep scale stress: sequence packing + decontamination at N×.

Two claims to measure (SCALE.md):

1. **Packing**: the two-level distributed prefix sum (per-block window +
   broadcast block offsets, `plans.extensions.pack_sequences_frame`) is
   (a) EXACT — identical to the one-global-window form at every scale —
   and (b) linear in wall time, because no stage ever funnels the corpus
   through one partition.  At each N the tool recomputes the naive
   single-window answer and asserts frame equality before timing.

2. **Decontamination**: with per-copy token salting (no 13-gram can
   match across copies), contaminated docs and total gram hits must grow
   EXACTLY linearly — any superlinear growth would mean the broadcast
   gram join is manufacturing cross-copy collisions.

Usage: python tools/scale_stress_training_prep.py [n_copies ...]
       (default: 1 4 16 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from airflow_postgres_etl_spark.operators import text as X  # noqa: E402
from airflow_postgres_etl_spark.plans.extensions import (  # noqa: E402
    decontaminate_hits_frame,
    pack_sequences_frame,
)
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402
from scale_stress_dedup import replicate_salted  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def naive_pack(docs, budget: int = 512):
    """The one-global-window form — the exactness oracle for the
    two-level decomposition (fine at stress sizes; THIS is the shape the
    production path exists to avoid)."""
    t = docs.select(
        "doc_id", X.bpe_token_count_expr().cast("long").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    t = t.withColumn("s", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    b = F.lit(budget)
    return t.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("s") / b).alias("seq_id"),
        (F.col("s") % b).alias("seq_offset"),
        (
            F.floor((F.col("s") + F.col("n_tokens") - 1) / b)
            - F.floor(F.col("s") / b)
            + 1
        ).alias("n_seqs_spanned"),
    )


def bpe_stress(ns: list[int]) -> None:
    """Measure the BPE decoupling claim: replicate documents WITHOUT
    salting (same text, shifted ids) so the corpus grows N× while the
    vocabulary stays CONSTANT — the word-frequency pass should scale
    with the corpus, the merge iterations should stay flat (they touch
    only the vocab).  Run with `--bpe`."""
    from pyspark.sql import functions as F

    from airflow_postgres_etl_spark.caching import release_caches
    from airflow_postgres_etl_spark.operators import text as X
    from airflow_postgres_etl_spark.plans.extensions import _BPE_MERGES

    spark = get_spark(app_name="scale_stress_bpe")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for n in ns:
        copies = [
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            for i in range(n)
        ]
        docs = copies[0]
        for c in copies[1:]:
            docs = docs.unionByName(c)
        release_caches()
        # corpus pass alone: the word-frequency aggregate
        t0 = time.time()
        vocab_size = (
            docs.select(F.explode(X.tokens_expr()).alias("w"))
            .groupBy("w")
            .count()
            .count()
        )
        corpus_pass_s = time.time() - t0
        # full run (corpus pass + all merge iterations on the vocab);
        # per-iteration timing uses a driver-materialized argmax — same
        # dataflow as the registered lazy query, instrumented per round
        release_caches()
        t1 = time.time()
        from airflow_postgres_etl_spark.plans import extensions as E

        words = docs.select(F.explode(X.tokens_expr()).alias("word")).groupBy(
            "word"
        ).agg(F.count("*").alias("weight")).repartition(E._BPE_VOCAB_PARTITIONS)
        from airflow_postgres_etl_spark.caching import register_cache

        words = register_cache(words)
        syms = words.withColumn(
            "sym",
            F.concat(
                F.lit(" "),
                F.array_join(F.regexp_extract_all("word", F.lit("."), 0), " "),
                F.lit(" "),
            ),
        )
        iter_times = []
        for i in range(_BPE_MERGES):
            ti = time.time()
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
            best_row = (
                pairs.groupBy("pa")
                .agg(F.sum("weight").alias("freq"))
                .orderBy(F.desc("freq"), "pa")
                .limit(1)
                .collect()[0]
            )
            pat = F.lit(f" {best_row.pa} ")
            rep = F.lit(" " + best_row.pa.replace(" ", "") + " ")
            syms = syms.withColumn(
                "sym", F.replace(F.replace(F.col("sym"), pat, rep), pat, rep)
            )
            iter_times.append(round(time.time() - ti, 3))
        total_s = time.time() - t1
        release_caches()
        print(
            json.dumps(
                {
                    "mode": "bpe",
                    "n_copies": n,
                    "n_docs": n * 5000,
                    "vocab": int(vocab_size),
                    "corpus_pass_s": round(corpus_pass_s, 2),
                    "iter_s": iter_times,
                    "total_s": round(total_s, 2),
                }
            ),
            flush=True,
        )


def main(ns: list[int]) -> None:
    spark = get_spark(app_name="scale_stress_training_prep")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    for n in ns:
        docs = replicate_salted(base, n)
        n_docs = docs.count()

        t0 = time.time()
        packed = pack_sequences_frame(docs)
        n_seqs, max_seq = packed.agg(
            F.countDistinct("seq_id"), F.max("seq_id")
        ).first()
        pack_s = time.time() - t0
        # exactness vs the single-window form: anti-join both ways is empty
        naive = naive_pack(docs)
        mismatch = (
            packed.exceptAll(naive).count() + naive.exceptAll(packed).count()
        )

        t1 = time.time()
        hits = decontaminate_hits_frame(docs)
        n_bad, total_hits = hits.agg(
            F.count("*"), F.coalesce(F.sum("n_hits"), F.lit(0))
        ).first()
        decon_s = time.time() - t1

        print(
            json.dumps(
                {
                    "n_copies": n,
                    "n_docs": n_docs,
                    "pack_s": round(pack_s, 2),
                    "n_seqs": int(n_seqs),
                    "max_seq": int(max_seq),
                    "pack_mismatch_rows": int(mismatch),
                    "decon_s": round(decon_s, 2),
                    "contaminated_docs": int(n_bad),
                    "gram_hits": int(total_hits),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--bpe":
        bpe_stress([int(a) for a in args[1:]] or [1, 4, 16, 64])
    else:
        main([int(a) for a in args] or [1, 4, 16, 64])
