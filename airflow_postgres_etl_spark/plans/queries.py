"""Declared analytical query library.

Each query exists twice with identical column names and value rounding:

- a DataFrame-form callable ``(spark, sf_dir) -> DataFrame`` in ``QUERIES``;
- an ANSI-SQL oracle string (DuckDB dialect-compatible) in ``ORACLE``.

The driver (and ``tests/test_queries_oracle.py``) run both and compare
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- floating aggregates are rounded (sum order differs between engines);
- every ``LIMIT`` is preceded by a **total** order (explicit tie-breakers) so
  the selected set is deterministic.

Q1–Q4 are the reference's own declared queries (``README.md:267-320`` + the
implied FK join, SURVEY §2.3) expressed against the testdata analogs.  The
TPC-H-style queries widen coverage to the operator classes the engine must
scale: multi-join, partial aggs, top-k, semi/anti joins, windows, rollup.

Scale notes are on each query: what shuffles, what broadcasts, and why the
plan survives 1000 executors.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.parquet_source import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

#: Queries whose plan shape deliberately does not scale — all-pairs /
#: cross joins, or uncapped pigeonhole block joins whose candidate set
#: saturates (measured at 64x): they exist ONLY as exactness baselines
#: for their bucketed/capped production twins and must never be run at
#: scale.  Downstream users should treat membership here as "do not
#: ship"; the scale paths are the LSH / IVF / pigeonhole-`*_capped`
#: variants that pass the same differentials.
BASELINE_ONLY: set[str] = set()

#: Registered queries EXCLUDED from the driver-rotation surface
#: (``__spark_entry__.queries()``), r10 — VERDICT r9 task 2's registry
#: fold.  Every entry here is a forced-branch twin, parameter variant,
#: intermediate, or exactness baseline of a query that STAYS in
#: rotation; each keeps its full DuckDB oracle and runs in the pytest
#: sweep (tests/test_queries_oracle.py iterates QUERIES/ORACLE
#: directly) — the differential coverage is unchanged, only the
#: ~50-slot driver window stops spending rotation slots on variants,
#: bounding green-row staleness for the operator-class representatives.
ROTATION_EXCLUDED: set[str] = set()


def query(
    name: str,
    oracle: str | None = None,
    *,
    baseline_only: bool = False,
    rotation: bool = True,
):
    """Register a query callable (and its SQL oracle twin).

    ``baseline_only=True`` flags a deliberately non-scalable exactness
    baseline (recorded in :data:`BASELINE_ONLY`).  ``rotation=False``
    keeps the query (and its oracle, and its pytest differential) but
    removes it from the driver-rotation surface (recorded in
    :data:`ROTATION_EXCLUDED` — see its doc for the policy).
    """

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if baseline_only:
            BASELINE_ONLY.add(name)
        if not rotation:
            ROTATION_EXCLUDED.add(name)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Q1 — trackings/events per minute (reference README.md:267-280).
# One hash-agg shuffle on the minute bucket; partial aggregation map-side.
# At 100 TB: ~minutes cardinality is tiny vs input -> near-total map-side
# combine, final agg is cheap; ORDER BY + LIMIT is TakeOrderedAndProject.
# ---------------------------------------------------------------------------
@query(
    "q1_events_per_minute",
    """
    SELECT date_trunc('minute', ts) AS minute, count(*) AS n_events
    FROM events
    GROUP BY 1
    ORDER BY minute
    LIMIT 1000
    """,
)
def q1_events_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(F.count("*").alias("n_events"))
        .orderBy("minute")
        .limit(1000)
    )


# ---------------------------------------------------------------------------
# Q2 — top event types (reference README.md:283-295: top-k group counts).
# Spark plans TakeOrderedAndProject (true distributed top-k: per-partition
# heaps, no global sort).  Tie-break on event_type for a deterministic set.
# ---------------------------------------------------------------------------
@query(
    "q2_top_event_types",
    """
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type
    LIMIT 1000
    """,
)
def q2_top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("event_type"))
        .limit(1000)
    )


# Per-user variant — high-cardinality grouping key (the shape that actually
# stresses the shuffle at scale; AQE coalesces the post-agg partitions).
@query(
    "q2b_top_users",
    """
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 100
    """,
)
def q2b_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q3 — rank window over grouped counts (reference README.md:299-320:
# CTE + RANK() OVER (ORDER BY count DESC), QUALIFY-style filter).
# The global window runs on ONE partition — safe because it sees
# post-aggregation rows only (|distinct event_type|, tiny at any scale).
# ---------------------------------------------------------------------------
@query(
    "q3_rank_event_types",
    """
    WITH counts AS (
        SELECT event_type, count(*) AS total_events
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, total_events,
           rank() OVER (ORDER BY total_events DESC) AS event_rank
    FROM counts
    QUALIFY event_rank <= 10
    ORDER BY event_rank, event_type
    """,
)
def q3_rank_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(F.count("*").alias("total_events"))
    w = Window.orderBy(F.desc("total_events"))
    return (
        counts.withColumn("event_rank", F.rank().over(w).cast("long"))
        .filter(F.col("event_rank") <= 10)
        .orderBy("event_rank", "event_type")
    )


# ---------------------------------------------------------------------------
# Q4 — parent⋈child FK join (reference README.md:99).  customer⋈orders is
# the testdata analog of tracking⋈events.  Left join preserves parents with
# no children (the outer-explode semantics, T5).  At scale: orders shuffles
# on o_custkey, customer broadcasts if small else sort-merge; AQE decides.
# ---------------------------------------------------------------------------
@query(
    "q4_customer_orders",
    """
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def q4_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# TPC-H-style coverage (the operator classes a real engine must scale).
# ---------------------------------------------------------------------------


# Q1-style pricing summary: wide partial aggregation — the canonical
# map-side-combine workload; scan-bound at 100 TB with full pushdown.
@query(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Q3-style shipping priority: selective dim filter + 3-way join + top-k.
# customer filter broadcast into orders; lineitem shuffles once on orderkey.
@query(
    "tpch_q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# Q5-style revenue by nation: 5-way join; all dims broadcast, lineitem never
# shuffles for the dim joins — only the final groupBy (25 groups) shuffles.
@query(
    "tpch_q5_revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def tpch_q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


# Q6-style: pure scan + filter + scalar agg — measures pushdown quality.
@query(
    "tpch_q6_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= timestamp '1994-01-01 00:00:00'
      AND l_shipdate < timestamp '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


# Semi/anti join coverage: customers with at least one open order (semi) and
# with none at all (anti) — Spark plans LeftSemi/LeftAnti hash joins.
@query(
    "q_customers_with_open_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
)
def q_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_customers_without_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    ORDER BY c_custkey
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# Partitioned-window coverage (vs Q3's global window): top-3 orders per
# customer by price — row_number over a keyed window, shuffle on o_custkey.
@query(
    "q_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


# Rollup coverage: multi-level aggregate in one pass (Catalyst expands the
# grouping sets; one shuffle).  NULL grouping levels coalesced for parity.
@query(
    "q_rollup_order_status",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def q_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )
