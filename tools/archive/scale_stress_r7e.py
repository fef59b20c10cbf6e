"""Round-7e operator scale stress: CDC apply, blocked ER, triangles,
market basket.

Claims to measure (SCALE.md):

- `sink.apply_changes`: applying a FIXED-size CDC batch is flat in
  table size — the stored-sequence probe is bucket-pruned to the
  batch keys' buckets and the write is one O(net-change) MOR delta
  commit; a redelivered (all-stale) batch is a no-write no-op.
- `linkage` ER: linear in candidate pairs when block sizes are held
  constant (copies get fresh blocking-key values, the real-world
  "more entities, same attribute cardinality per block" regime).
- `graph.triangle_counts`: ~linear in |E| on disjoint graph copies —
  degree orientation keeps wedge fan-out bounded as the graph grows.
- market basket: linear in baskets (fan-out is per-basket size).

Usage: python tools/scale_stress_r7e.py [n_copies ...] (default 1 4 16 64)
NEVER run while pytest or another Spark job shares the host.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark import sink  # noqa: E402
from airflow_postgres_etl_spark.operators.graph import triangle_counts  # noqa: E402
from airflow_postgres_etl_spark.operators.linkage import (  # noqa: E402
    best_links,
    candidate_pairs,
)
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _copies(df, n, shift_cols: dict[str, int]):
    parts = [
        df.select(
            *[
                (F.col(c) + F.lit(i * s)).alias(c)
                if c in shift_cols
                else F.col(c)
                for (c, s) in [(c, shift_cols.get(c, 0)) for c in df.columns]
            ]
        )
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stress_cdc(spark, n, tmp):
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v")
    )
    big = _copies(o, n, {"k": 100_000_000}).localCheckpoint(eager=True)
    rows = big.count()
    tgt = os.path.join(tmp, f"cdc{n}")
    sink.keyed_overwrite_parquet(spark, big, tgt, key="k", num_buckets=16)
    # FIXED ~1500-row batch: updates, deletes, new keys — same absolute
    # size at every N (the trickle-CDC regime)
    batch = (
        o.filter(F.col("k") % 97 == 0)
        .select(
            "k",
            F.lit(5).alias("seq"),
            F.when(F.col("k") % 3 == 0, "D").otherwise("U").alias("op"),
            (F.col("v") + 1).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    n_batch = batch.count()
    t0 = time.perf_counter()
    r1 = sink.apply_changes(spark, tgt, batch, "seq")
    t_apply = time.perf_counter() - t0
    t0 = time.perf_counter()
    r2 = sink.apply_changes(spark, tgt, batch, "seq")  # full redelivery
    t_redeliver = time.perf_counter() - t0
    assert r2["upserted"] == 0 and r2["deleted"] == 0
    return {
        "rows": rows,
        "batch": n_batch,
        "apply_s": round(t_apply, 3),
        "redeliver_s": round(t_redeliver, 3),
        "applied": r1["upserted"] + r1["deleted"],
    }


def stress_er(spark, n):
    p = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    # fresh blocking values per copy: block sizes constant, entities xN
    big = _copies(p, n, {"p_partkey": 10_000_000, "p_size": 1000})
    big = big.localCheckpoint(eager=True)
    rows = big.count()
    pos = (F.col("p_partkey") % (F.length("p_name") - 2) + 2).cast("int")
    dirty = (
        big.filter(F.col("p_partkey") % 3 == 0)
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
    t0 = time.perf_counter()
    links = best_links(
        candidate_pairs(dirty, big, ["p_brand", "p_size"]),
        "d_id", "d_name", "p_name", 2, "p_partkey",
    )
    n_links = links.count()
    return {"rows": rows, "links": n_links,
            "er_s": round(time.perf_counter() - t0, 3)}


def _edges(spark, n):
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    )
    big = _copies(li, n, {"k": 100_000_000, "p": 10_000_000})
    b = big.distinct()
    b2 = b.select("k", F.col("p").alias("p2"))
    return (
        b.join(b2, "k")
        .filter(F.col("p") < F.col("p2"))
        .groupBy(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .drop("c")
    )


def stress_triangles(spark, n):
    e = _edges(spark, n).localCheckpoint(eager=True)
    n_edges = e.count()
    t0 = time.perf_counter()
    total = triangle_counts(e).agg(F.sum("n_triangles")).collect()[0][0]
    return {"edges": n_edges, "tri_corners": int(total or 0),
            "tri_s": round(time.perf_counter() - t0, 3)}


def stress_basket(spark, n):
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    )
    big = _copies(li, n, {"k": 100_000_000, "p": 10_000_000}).localCheckpoint(
        eager=True
    )
    rows = big.count()
    t0 = time.perf_counter()
    b = big.distinct()
    b2 = b.select("k", F.col("p").alias("p2"))
    top = (
        b.join(b2, "k")
        .filter(F.col("p") < F.col("p2"))
        .groupBy("p", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "p", "p2")
        .limit(20)
        .collect()
    )
    return {"rows": rows, "top_support": int(top[0]["support"]),
            "basket_s": round(time.perf_counter() - t0, 3)}


def main(copies):
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="r7e_")
    results = []
    try:
        for n in copies:
            row = {"copies": n}
            row.update(stress_cdc(spark, n, tmp))
            row.update(stress_er(spark, n))
            row.update(stress_triangles(spark, n))
            row.update(stress_basket(spark, n))
            results.append(row)
            print(json.dumps(row), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 4, 16, 64])
