"""Dedup-stack scale stress: measure LSH candidate growth vs corpus size.

The central scale claim of the dedup design (SCALE.md) is that MinHash-LSH
candidate generation grows ~linearly with document count while the pair
space (docs²) grows quadratically.  This probe measures it: replicate the
sf0.1 documents table N× with

- shifted doc_ids (distinct keys per copy), and
- per-copy token salting (every inter-word gap gains a copy marker token,
  so every 3-gram shingle differs across copies and copies can NOT
  near-dup-match each other — each copy is an independent corpus with the
  same internal near-dup density).

Then count LSH band-collision candidate pairs and verified (jaccard ≥ 0.5)
pairs, and record wall time.  Linear growth ⇒ candidates/docs stays flat
as docs² explodes.

Usage: python tools/scale_stress_dedup.py [n_copies ...]  (default: 1 4 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.operators import dedup as D  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_salted(docs, n: int):
    copies = []
    for i in range(n):
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
        ).withColumn(
            # suffix the copy marker onto EVERY token (a bijection on the
            # token alphabet): shingles never collide across copies, and —
            # unlike inserting marker tokens between words — no new
            # high-frequency shingles are created, so each copy keeps the
            # base corpus's exact shingle frequency distribution.
            "text",
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1cpy{i}")
            if i
            else F.col("text"),
        )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def pipeline_stress(ns: list[int]) -> None:
    """End-to-end near-dedup corpus cleaning at increasing scale: LSH
    candidates (capped, the shipped default) → exact verify → min-label
    components → anti-join.  Records wall time AND the components
    iteration count — pointer-jumping convergence is O(log diameter), so
    iterations must stay flat as the corpus grows (the per-copy salting
    keeps cluster shapes constant; only cluster COUNT scales)."""
    from airflow_postgres_etl_spark.operators.graph import connected_components

    spark = get_spark(app_name="scale_stress_near_dedup")
    results = []
    for n in ns:
        docs = replicate_salted(
            load_table(spark, SF_DIR, "documents").select(
                "doc_id", "source", "text"
            ),
            n,
        )
        n_docs = docs.count()
        t0 = time.perf_counter()
        pairs = D.lsh_verified_pairs(docs, max_band_size=64)
        st: dict = {}
        comp = connected_components(pairs, src="doc_a", dst="doc_b", stats=st)
        dropped = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        kept = docs.join(dropped, "doc_id", "left_anti").count()
        wall = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        results.append(
            {
                "n_copies": n,
                "docs": n_docs,
                "kept": kept,
                "dropped": n_docs - kept,
                "cc_iterations": st.get("iterations"),
                "t_pipeline_sec": wall,
                "sec_per_1k_docs": round(wall / n_docs * 1000, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"metric": "scale_stress_near_dedup_pipeline", "rows": results}))


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--pipeline":
        pipeline_stress([int(a) for a in args[1:]] or [1, 4, 16, 64])
        return
    ns = [int(a) for a in args] or [1, 4, 16]
    spark = get_spark(app_name="scale_stress_dedup")
    results = []
    for n in ns:
        docs = replicate_salted(
            load_table(spark, SF_DIR, "documents").select("doc_id", "text"), n
        )
        n_docs = docs.count()
        t0 = time.perf_counter()
        candidates = D.lsh_candidate_pairs(docs).count()
        t_cand = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        verified = D.lsh_verified_pairs(docs).count()
        t_ver = round(time.perf_counter() - t0, 2)
        # hot-band occupancy: the skew measurement behind max_band_size /
        # max_block_size (SCALE.md "hot bands").  LSH band keys are md5
        # over 3 minhashes (huge keyspace — occupancy tracks true dup
        # groups); simhash pigeonhole blocks live in a 2^12 keyspace and
        # SATURATE as the corpus grows — the block join's documented
        # scale cliff, bounded by the cap.
        band = D.lsh_band_stats(docs).collect()[0].asDict()
        block = D.simhash_block_stats(docs).collect()[0].asDict()
        t0 = time.perf_counter()
        sim_capped = D.simhash_near_pairs(docs, max_block_size=1000).count()
        t_sim_capped = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()  # per-n shingle caches must not leak
        results.append(
            {
                "n_copies": n,
                "docs": n_docs,
                "pair_space": n_docs * (n_docs - 1) // 2,
                "lsh_candidates": candidates,
                "verified_pairs": verified,
                "candidates_per_doc": round(candidates / n_docs, 3),
                "t_candidates_sec": t_cand,
                "t_verified_sec": t_ver,
                "lsh_max_band_docs": band["max_band_docs"],
                "lsh_cand_upper": band["candidate_pairs_upper"],
                "simhash_max_block_docs": block["max_band_docs"],
                "simhash_cand_upper": block["candidate_pairs_upper"],
                "simhash_capped_pairs_1000": sim_capped,
                "t_simhash_capped_sec": t_sim_capped,
            }
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"metric": "scale_stress_dedup", "rows": results}))


if __name__ == "__main__":
    main()
