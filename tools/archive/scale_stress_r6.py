"""Round-6 operator scale stress: KMV sketches, BPE encode, DQ report,
and predicate DML write cost at N×.

Claims to measure (SCALE.md):

1. **KMV sketch**: build time grows ~linearly with the corpus (the one
   distinct shuffle dominates) while the SKETCH stays k longs per group
   — and the estimate stays within the 1/sqrt(k) band at every N, i.e.
   accuracy does not decay with scale.  Salting keeps level-1 windows
   bounded: the tool also records the estimate's relative error.

2. **BPE encode**: per-copy token salting makes the vocabulary grow
   linearly in N (worst case for the vocab-sized design); encode time
   must track the vocab/corpus pass, never explode — the merge
   iterations stay vocab-sized.

3. **DQ report**: one aggregate pass for all predicate rules — wall
   time ~linear in rows, flat in RULE count (measured 1 vs 8 rules).

4. **DML delete**: `keyed_delete_where` on an N×-row keyed table with a
   FIXED-size match set — write bytes must stay O(affected keys), not
   O(table): the tool records rewritten-file counts alongside time.

Usage: python tools/scale_stress_r6.py [n_copies ...] (default: 1 4 16 64)
NEVER run while pytest or another Spark job shares the host.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.operators import expectations as E  # noqa: E402
from airflow_postgres_etl_spark.operators import sketch as K  # noqa: E402
from airflow_postgres_etl_spark.operators.text import tokens_expr  # noqa: E402
from airflow_postgres_etl_spark.plans.extensions import (  # noqa: E402
    _BPE_MERGES,
    _bpe_symbol_chain,
)
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402
from scale_stress_dedup import replicate_salted  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KK = 128


def kmv_stress(spark, ns):
    from airflow_postgres_etl_spark.operators.dedup import shingles_from_tokens

    docs = load_table(spark, SF_DIR, "documents")
    for n in ns:
        corpus = replicate_salted(docs, n).localCheckpoint(eager=True)
        toks = corpus.select("source", tokens_expr().alias("w")).select(
            "source", F.explode(shingles_from_tokens(F.col("w"))).alias("tok")
        )
        t0 = time.time()
        sk = K.kmv_sketch(toks, ["source"], F.col("tok"), k=KK)
        rows = sk.select(
            "source", "n_k", K.kmv_estimate_expr(KK).alias("est")
        ).collect()
        dt = time.time() - t0
        exact = {
            r.source: r.x
            for r in toks.distinct()
            .groupBy("source")
            .agg(F.count("*").alias("x"))
            .collect()
        }
        errs = [
            abs(r.est - exact[r.source]) / exact[r.source]
            for r in rows
            if r.n_k >= KK
        ]
        print(
            json.dumps(
                {
                    "op": "kmv_sketch",
                    "n": n,
                    "sec": round(dt, 2),
                    "groups": len(rows),
                    "max_rel_err": round(max(errs), 4) if errs else None,
                }
            ),
            flush=True,
        )
        corpus.unpersist()


def bpe_stress(spark, ns):
    docs = load_table(spark, SF_DIR, "documents")
    for n in ns:
        corpus = replicate_salted(docs, n).localCheckpoint(eager=True)
        t0 = time.time()
        _m, syms = _bpe_symbol_chain(corpus, _BPE_MERGES)
        enc = syms.select(
            "word",
            F.size(
                F.filter(F.split("sym", " "), lambda x: x != "")
            ).alias("n_toks"),
        )
        words = corpus.select("doc_id", F.explode(tokens_expr()).alias("word"))
        total = (
            words.join(enc, "word")
            .agg(F.sum("n_toks").alias("t"), F.countDistinct("word").alias("v"))
            .collect()[0]
        )
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "op": "bpe_encode",
                    "n": n,
                    "sec": round(dt, 2),
                    "vocab": total.v,
                    "bpe_tokens": total.t,
                }
            ),
            flush=True,
        )
        from airflow_postgres_etl_spark.caching import release_caches

        release_caches()
        corpus.unpersist()


def dq_stress(spark, ns):
    ev = load_table(spark, SF_DIR, "events")
    for n in ns:
        big = ev
        for i in range(1, n):
            big = big.unionByName(
                ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10**9))
            )
        big = big.localCheckpoint(eager=True)
        for n_rules in (1, 8):
            rules = [
                E.expect(f"r{i}", f"value > {i} OR value IS NULL")
                for i in range(n_rules)
            ]
            t0 = time.time()
            E.check_expectations(big, rules).collect()
            dt = time.time() - t0
            print(
                json.dumps(
                    {"op": "dq_report", "n": n, "rules": n_rules, "sec": round(dt, 2)}
                ),
                flush=True,
            )
        big.unpersist()


def dml_stress(spark, ns, tmp_root="/tmp/dml_stress"):
    from airflow_postgres_etl_spark.sink import (
        keyed_delete_where,
        keyed_overwrite_parquet,
    )

    ev = load_table(spark, SF_DIR, "events")
    for n in ns:
        big = ev
        for i in range(1, n):
            big = big.unionByName(
                ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10**9))
            )
        target = f"{tmp_root}/{n}"
        keyed_overwrite_parquet(
            spark,
            big.withColumnRenamed("event_id", "oid__id"),
            target,
            num_buckets=32,
            vacuum=False,
        )
        files_before = set(glob.glob(f"{target}/data/*/*/*.parquet"))
        t0 = time.time()
        # fixed 1000-key match set regardless of table size
        n_del = keyed_delete_where(spark, target, "oid__id < 1000")
        dt = time.time() - t0
        files_after = set(glob.glob(f"{target}/data/*/*/*.parquet"))
        print(
            json.dumps(
                {
                    "op": "delete_where",
                    "n": n,
                    "sec": round(dt, 2),
                    "deleted": n_del,
                    "new_files": len(files_after - files_before),
                    "base_files_untouched": files_before <= files_after,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark(app_name="scale_stress_r6")
    which = os.environ.get("R6_STRESS", "kmv,bpe,dq,dml").split(",")
    if "kmv" in which:
        kmv_stress(spark, ns)
    if "bpe" in which:
        bpe_stress(spark, ns)
    if "dq" in which:
        dq_stress(spark, ns)
    if "dml" in which:
        dml_stress(spark, ns)
