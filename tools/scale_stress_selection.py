"""Scale stress for the two corpus-curation operators added after r4's
measured set:

- ``span_coverage`` (duplicated-span signal): replicate the sf0.1
  documents N× with per-copy token salting (same scheme as
  ``scale_stress_dedup``: cross-copy spans can never collide, each copy
  keeps the base span-frequency distribution).  The claim: wall time and
  exploded-span volume grow ~linearly in N — there is no pairwise stage
  to saturate, only a span hash-agg and a linear join back.

- ``ordered_prefix_by_budget`` (token-budget selection): replicate with
  shifted doc_ids only (costs/priorities unchanged).  The claim the
  decomposition exists to pin: the single-partition window runs over
  |distinct priorities| rows, which stays CONSTANT as the corpus grows
  (n_chars domain is fixed), so wall time grows ~linearly while the
  naive global-window formulation would serialize the whole corpus
  through one task.

Usage: python tools/scale_stress_selection.py [n_copies ...]  (default 1 4 16 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.operators import dedup as D  # noqa: E402
from airflow_postgres_etl_spark.operators import text as X  # noqa: E402
from airflow_postgres_etl_spark.operators.selection import (  # noqa: E402
    budget_scalar,
    ordered_prefix_by_budget,
)
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(docs, n: int, salt_text: bool):
    copies = []
    for i in range(n):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if salt_text and i:
            c = c.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1cpy{i}")
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def removal_stress(ns: list[int]) -> None:
    """``remove_shared_spans`` at N× (salted copies — cross-copy spans
    never collide, so removed-position totals must be exactly linear and
    wall time ~linear: hash-agg + linear join back + rebuild, no
    pairwise stage)."""
    spark = get_spark(app_name="scale_stress_span_removal")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = []
    for n in ns:
        docs = replicate(base, n, salt_text=True)
        n_docs = docs.count()
        t0 = time.perf_counter()
        agg = (
            D.remove_shared_spans(docs, n=5)
            .agg(
                F.count("*").alias("docs"),
                F.sum("n_removed").alias("total_removed"),
                F.sum((F.col("n_removed") > 0).cast("long")).alias(
                    "docs_touched"
                ),
            )
            .collect()[0]
        )
        wall = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "n_copies": n,
                "docs": n_docs,
                "docs_touched": agg.docs_touched,
                "total_removed": agg.total_removed,
                "t_sec": wall,
                "sec_per_1k_docs": round(wall / n_docs * 1000, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "scale_stress_span_removal", "rows": rows}))


def classifier_cdc_stress(ns: list[int]) -> None:
    """NB classifier and CDC chunking at N× (unsalted for the
    classifier — the vocab and the broadcast model grid stay CONSTANT
    while the corpus grows, so the token×|sources| fan-out must
    collapse map-side and wall time stay ~linear; salted for CDC so
    chunk sharing is per-copy and totals exactly linear)."""
    from airflow_postgres_etl_spark.plans.queries import QUERIES  # noqa: F401
    from airflow_postgres_etl_spark.plans import extensions as E

    spark = get_spark(app_name="scale_stress_classifier_cdc")
    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    rows = []
    for n in ns:
        docs = replicate(base, n, salt_text=False)
        n_docs = docs.count()
        t0 = time.perf_counter()
        # inline the classifier body over the replicated frame: same
        # code path as the registered query, different input
        t = docs.select(
            "doc_id", "source", F.explode(X.tokens_expr()).alias("term")
        )
        cnts = t.groupBy("source", "term").agg(F.count("*").alias("cnt"))
        totals = t.groupBy("source").agg(F.count("*").alias("n_s"))
        vocab = t.select("term").distinct()
        v_size = vocab.agg(F.count("*").alias("v"))
        grid = (
            vocab.crossJoin(totals)
            .join(cnts, ["source", "term"], "left")
            .crossJoin(F.broadcast(v_size))
            .select(
                F.col("source").alias("cand"), "term",
                F.floor(F.lit(1000000.0) * F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_s") + F.col("v")))).cast("long").alias("lp_q"),
            )
        )
        from pyspark.sql.window import Window
        scored = (
            t.join(F.broadcast(grid), "term")
            .groupBy("doc_id", "source", "cand")
            .agg(F.sum("lp_q").alias("score_q"))
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), F.asc("cand"))
        pred = scored.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") == 1
        )
        n_correct = pred.filter(F.col("source") == F.col("cand")).count()
        wall_c = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()

        docs_s = replicate(base, n, salt_text=True)
        t0 = time.perf_counter()
        agg = (
            D.cdc_chunk_stats(docs_s, mod=16)
            .agg(F.sum("n_chunks").alias("chunks"), F.sum("n_shared").alias("shared"))
            .collect()[0]
        )
        wall_k = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        rows.append({
            "n_copies": n, "docs": n_docs,
            "nb_correct": n_correct, "t_classifier_sec": wall_c,
            "cdc_chunks": agg.chunks, "cdc_shared": agg.shared,
            "t_cdc_sec": wall_k,
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "scale_stress_classifier_cdc", "rows": rows}))


def main() -> None:
    if sys.argv[1:2] == ["--removal"]:
        removal_stress([int(a) for a in sys.argv[2:]] or [1, 4, 16, 64])
        return
    if sys.argv[1:2] == ["--classifier-cdc"]:
        classifier_cdc_stress([int(a) for a in sys.argv[2:]] or [1, 4, 16, 64])
        return
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark(app_name="scale_stress_selection")
    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars", "text"
    )

    span_rows, budget_rows = [], []
    for n in ns:
        docs = replicate(base, n, salt_text=True)
        n_docs = docs.count()
        t0 = time.perf_counter()
        cov = D.span_coverage(docs, n=5)
        agg = cov.agg(
            F.count("*").alias("docs_scored"),
            F.sum("n_spans").alias("total_spans"),
            F.sum("n_shared").alias("total_shared"),
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        span_rows.append(
            {
                "n_copies": n,
                "docs": n_docs,
                "docs_scored": agg.docs_scored,
                "total_spans": agg.total_spans,
                "total_shared": agg.total_shared,
                "t_sec": wall,
                "sec_per_1k_docs": round(wall / n_docs * 1000, 3),
            }
        )
        print(json.dumps(span_rows[-1]), flush=True)

    for n in ns:
        docs = replicate(base, n, salt_text=False)
        d = docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.size(X.tokens_expr()).alias("n_tokens"),
        )
        n_docs = d.count()
        n_prios = d.select("n_chars").distinct().count()
        t0 = time.perf_counter()
        kept = ordered_prefix_by_budget(
            d,
            budget_scalar(d, "n_tokens", 0.4),
            priority="n_chars",
            cost="n_tokens",
            key="doc_id",
        ).count()
        wall = round(time.perf_counter() - t0, 2)
        budget_rows.append(
            {
                "n_copies": n,
                "docs": n_docs,
                "distinct_priorities": n_prios,
                "kept": kept,
                "t_sec": wall,
                "sec_per_1k_docs": round(wall / n_docs * 1000, 3),
            }
        )
        print(json.dumps(budget_rows[-1]), flush=True)

    print(
        json.dumps(
            {
                "metric": "scale_stress_selection",
                "span_coverage": span_rows,
                "budget_select": budget_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
