"""Scale-stress probe: replicate sf0.1 facts N× in-plan (union of shifted
copies — distinct keys per copy) and run the headline aggregation/join
queries, verifying wall-time scales ~linearly and no plan falls over.

Usage: python tools/scale_stress.py [n_copies]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, n: int, key_cols: list[str]):
    copies = []
    for i in range(n):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * 10_000_000))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(app_name="scale_stress")
    li = replicate(load_table(spark, SF_DIR, "lineitem"), n, ["l_orderkey"])
    o = replicate(load_table(spark, SF_DIR, "orders"), n, ["o_orderkey", "o_custkey"])
    c = replicate(load_table(spark, SF_DIR, "customer"), n, ["c_custkey"])

    rows = li.count()
    timings = {}

    t0 = time.perf_counter()
    (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
        .collect()
    )
    timings["q1_style_agg"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .collect()
    )
    timings["three_way_join_agg"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    li.groupBy("l_partkey").agg(F.sum("l_quantity")).orderBy(
        F.desc("sum(l_quantity)")
    ).limit(10).collect()
    timings["high_card_topk"] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "scale_stress",
                "n_copies": n,
                "lineitem_rows": rows,
                "timings_sec": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
