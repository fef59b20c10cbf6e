"""Connected-components unit tests on crafted graphs."""

from __future__ import annotations

from airflow_postgres_etl_spark.operators.graph import connected_components


def test_two_components_and_chain(spark):
    #  component {1,2,3} (triangle), {10,11} (edge), chain {20-21-22-23}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        ["src", "dst"],
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


def test_single_edge_and_self_loop(spark):
    edges = spark.createDataFrame([(5, 5), (7, 8)], ["src", "dst"])
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {5: 5, 7: 7, 8: 7}
