"""Expectations operator unit tests on hand-built fixtures — each rule
kind catches exactly the planted violations; the split loses no rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators import expectations as E


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, 10, "a", "2024-01-10 00:00:00"),
            (2, None, "a", "2024-01-09 00:00:00"),   # null v
            (3, -5, "b", "2024-01-01 00:00:00"),     # negative v, stale
            (3, 7, "zz", "2024-01-10 00:00:00"),     # dup id, bad tag
            (4, 99, "a", None),                       # null ts
        ],
        "id long, v long, tag string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_report_counts_each_rule_kind(spark):
    df = _fixture(spark)
    parent = spark.createDataFrame([(10,), (7,), (99,)], ["pid"])
    rules = [
        E.expect("v_pos", "v > 0"),                     # rows 2 (NULL), 3
        E.expect("tag_ok", "tag IN ('a','b')"),         # row 4
        E.expect_unique("id_unique", ["id"]),           # one extra id=3 row
        E.expect_foreign_key("v_fk", "v", parent, "pid"),  # v=-5 orphan
        E.expect_fresh("fresh_7d", "ts", 7 * 24 * 3600),   # 2024-01-01 row
    ]
    got = {
        r.rule: (r.kind, r.n_violations, r.n_rows)
        for r in E.check_expectations(df, rules).collect()
    }
    assert got == {
        "v_pos": ("predicate", 2, 5),
        "tag_ok": ("predicate", 1, 5),
        "id_unique": ("unique", 1, 5),
        "v_fk": ("foreign_key", 1, 5),
        "fresh_7d": ("fresh", 1, 5),
    }


def test_report_on_clean_frame_is_all_zero(spark):
    df = spark.createDataFrame([(1, 5), (2, 6)], "id long, v long")
    rules = [E.expect("v_pos", "v > 0"), E.expect_unique("u", ["id"])]
    got = E.check_expectations(df, rules).collect()
    assert all(r.n_violations == 0 for r in got)
    assert {r.n_rows for r in got} == {2}


def test_split_partitions_rows_exactly(spark):
    df = _fixture(spark)
    rules = [E.expect("v_pos", "v > 0"), E.expect("tag_ok", "tag IN ('a','b')")]
    clean, bad = E.split_by_expectations(df, rules)
    assert clean.count() + bad.count() == df.count()
    assert clean.columns == df.columns  # marker column stripped
    failures = sorted(
        (r.id, tuple(sorted(r.failed_rules))) for r in bad.collect()
    )
    # id=2: NULL v fails v_pos; id=3 twice — the negative-v row fails
    # v_pos, the zz-tag row fails tag_ok
    assert failures == [(2, ("v_pos",)), (3, ("tag_ok",)), (3, ("v_pos",))]


def test_split_with_no_predicate_rules_is_identity(spark):
    df = _fixture(spark)
    clean, bad = E.split_by_expectations(df, [E.expect_unique("u", ["id"])])
    assert clean.count() == df.count() and bad.count() == 0


def test_report_plan_is_single_pass_for_predicates(spark):
    """All predicate rules must share ONE aggregate over the frame —
    rule count must not multiply scans."""
    df = _fixture(spark)
    rules = [E.expect(f"r{i}", f"v > {i}") for i in range(8)]
    plan = (
        E.check_expectations(df, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    # one scan feeding one aggregate chain: the fixture appears once
    assert plan.count("LocalTableScan") <= 2  # union side may re-list
