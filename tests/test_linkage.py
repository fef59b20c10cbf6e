"""Blocked fuzzy matching (operators/linkage) and degree-oriented
triangle counting (operators/graph.triangle_counts) — hand-verifiable
fixtures."""

from __future__ import annotations

from airflow_postgres_etl_spark.operators.graph import triangle_counts
from airflow_postgres_etl_spark.operators.linkage import (
    best_links,
    block_stats,
    candidate_pairs,
)


def _master(spark):
    return spark.createDataFrame(
        [
            (1, "alpha widget", "B1"),
            (2, "alpha wodget", "B1"),
            (3, "gamma widget", "B1"),
            (4, "alpha widget", "B2"),
            (5, "delta thing", "B2"),
        ],
        ["m_id", "m_name", "blk"],
    )


def test_candidate_pairs_blocked_not_cross(spark):
    inc = spark.createDataFrame([(10, "alpha widget", "B1")], ["d_id", "d_name", "blk"])
    got = candidate_pairs(inc, _master(spark), ["blk"])
    assert {r["m_id"] for r in got.collect()} == {1, 2, 3}  # never B2


def test_candidate_pairs_max_block_cap(spark):
    inc = spark.createDataFrame(
        [(10, "x", "B1"), (11, "y", "B2")], ["d_id", "d_name", "blk"]
    )
    got = candidate_pairs(inc, _master(spark), ["blk"], max_block=2)
    # B1 has 3 master rows (> cap): excluded; B2 (2 rows) survives
    assert {r["m_id"] for r in got.collect()} == {4, 5}


def test_best_links_min_dist_then_tiebreak(spark):
    inc = spark.createDataFrame(
        [(10, "alpha widgee", "B1")], ["d_id", "d_name", "blk"]
    )
    pairs = candidate_pairs(inc, _master(spark), ["blk"])
    got = best_links(pairs, "d_id", "d_name", "m_name", 2, "m_id").collect()
    # dist 1 to m1 ("alpha widget"), dist 2 to m2, gamma at dist 3 cut
    assert len(got) == 1 and got[0]["m_id"] == 1 and got[0]["dist"] == 1
    # exact tie: two masters at equal distance -> smallest m_id wins
    inc2 = spark.createDataFrame([(11, "alpha wedget", "B1")], ["d_id", "d_name", "blk"])
    pairs2 = candidate_pairs(inc2, _master(spark), ["blk"])
    got2 = best_links(pairs2, "d_id", "d_name", "m_name", 2, "m_id").collect()
    assert got2[0]["m_id"] == 1 and got2[0]["dist"] == 1


def test_block_stats_distribution(spark):
    got = {
        r["block_size"]: (r["n_blocks"], r["pairs"])
        for r in block_stats(_master(spark), ["blk"]).collect()
    }
    assert got == {3: (1, 9), 2: (1, 4)}


def test_triangles_shared_edge(spark):
    # two triangles sharing edge 2-3; plus dupes/self-loops/reversals
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2), (2, 1), (5, 5), (1, 2)],
        ["src", "dst"],
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangles_star_has_none(spark):
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], ["src", "dst"]
    )
    assert triangle_counts(edges).count() == 0


def test_triangles_clique_k4(spark):
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], ["src", "dst"]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # C(3,2)=3 per node in K4
