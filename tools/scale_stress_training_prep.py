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
    main([int(a) for a in sys.argv[1:]] or [1, 4, 16, 64])
