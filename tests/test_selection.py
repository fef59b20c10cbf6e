"""Budget-prefix selection (operators/selection.py) and duplicated-span
coverage (operators/dedup.span_coverage): the decomposed running total
must equal the naive global-window prefix on every input shape —
priority ties spanning partitions, a budget that cuts mid-group, and
the degenerate budgets."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airflow_postgres_etl_spark.operators.dedup import span_coverage
from airflow_postgres_etl_spark.operators.selection import (
    budget_scalar,
    ordered_prefix_by_budget,
)


def _frame(spark):
    # priorities with heavy ties (three rows at 30, three at 20) so the
    # within-group running sum and the group-prefix both matter; keys
    # deliberately interleaved against priority order
    rows = [
        (1, 30, 7),
        (2, 20, 5),
        (3, 30, 4),
        (4, 10, 9),
        (5, 20, 6),
        (6, 30, 2),
        (7, 20, 3),
        (8, 10, 8),
    ]
    return spark.createDataFrame(rows, "doc_id long, prio long, cost long")


def _naive_prefix(df, budget: int):
    w = Window.orderBy(F.desc("prio"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        df.withColumn("__cum", F.sum("cost").over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_prefix_matches_naive_at_every_budget(spark):
    df = _frame(spark)
    total = sum(r.cost for r in df.collect())
    for budget in range(0, total + 2):
        got = _ids(
            ordered_prefix_by_budget(
                df, budget, priority="prio", cost="cost", key="doc_id"
            )
        )
        want = _ids(_naive_prefix(df, budget))
        assert got == want, f"budget={budget}: {got} != {want}"


def test_prefix_budget_cuts_mid_group(spark):
    df = _frame(spark)
    # order is (30: 1,3,6 = 7,4,2), (20: 2,5,7 = 5,6,3), (10: 4,8 = 9,8)
    # cum after prio-30 group = 13; budget 18 admits doc 2 (cum 18) but
    # not doc 5 (cum 24) — the cut lands inside the prio-20 group
    kept = _ids(
        ordered_prefix_by_budget(
            df, 18, priority="prio", cost="cost", key="doc_id"
        )
    )
    assert kept == [1, 2, 3, 6]


def test_prefix_budget_scalar_dataframe(spark):
    df = _frame(spark)
    # frac=0.5 of total 44 → floor(22.0) = 22: admits the prio-30 group
    # (13) + doc 2 (18), rejects doc 5 (24)
    b = budget_scalar(df, "cost", 0.5)
    assert b.collect()[0].budget == 22
    kept = _ids(
        ordered_prefix_by_budget(df, b, priority="prio", cost="cost", key="doc_id")
    )
    assert kept == [1, 2, 3, 6]
    # scalar-budget path must not leak helper columns
    out = ordered_prefix_by_budget(
        df, b, priority="prio", cost="cost", key="doc_id"
    )
    assert set(out.columns) == {"doc_id", "prio", "cost"}


def test_prefix_degenerate_budgets(spark):
    df = _frame(spark)
    assert _ids(ordered_prefix_by_budget(df, 0, priority="prio", cost="cost", key="doc_id")) == []
    assert (
        _ids(ordered_prefix_by_budget(df, 10_000, priority="prio", cost="cost", key="doc_id"))
        == _ids(df)
    )


def test_prefix_no_global_per_row_window(spark):
    """The plan gate: the only unpartitioned window runs over the
    per-priority AGGREGATE, never the input rows — the window that sees
    raw rows must be hash-partitioned on the priority column."""
    import re

    df = _frame(spark)
    plan = (
        ordered_prefix_by_budget(df, 18, priority="prio", cost="cost", key="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the per-row running sum: windowspecdefinition(prio, doc_id ASC ...)
    # — prio as the PARTITION arg, so it parallelizes by priority group
    assert re.search(
        r"windowspecdefinition\(prio#\d+L, doc_id#\d+L ASC", plan
    ), plan
    # exactly one single-partition exchange, and it feeds the per-priority
    # aggregate (bounded rows), not the raw input
    assert plan.count("Exchange SinglePartition") == 1, plan
    single = plan.split("Exchange SinglePartition", 1)[1]
    assert "HashAggregate" in single.split("Window", 1)[0] or "HashAggregate" in single, plan


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:
    # few distinct priorities (heavy tying) and small costs keep budgets
    # in an interesting range; the pure-Python prefix is the definition
    rows_strategy = st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9)),
        min_size=1,
        max_size=14,
    )

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=rows_strategy, budget_frac=st.floats(0.0, 1.2))
    def test_prefix_matches_definition_property(spark, rows, budget_frac):
        data = [
            (i, prio, cost) for i, (prio, cost) in enumerate(rows)
        ]
        total = sum(c for _, _, c in data)
        budget = int(budget_frac * total)
        df = spark.createDataFrame(data, "doc_id long, prio long, cost long")
        got = _ids(
            ordered_prefix_by_budget(
                df, budget, priority="prio", cost="cost", key="doc_id"
            )
        )
        # definitional prefix: (prio DESC, doc_id ASC), inclusive cumsum
        ordered = sorted(data, key=lambda r: (-r[1], r[0]))
        want, cum = [], 0
        for doc_id, _, cost in ordered:
            cum += cost
            if cum > budget:
                break
            want.append(doc_id)
        assert got == sorted(want)


def test_span_coverage_crafted(spark):
    # d1 and d2 share their full 5-token span; d3 is unique; d4 too short
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "one two three four five six"),
        (4, "too short here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_shared, r.shared_frac)
        for r in span_coverage(df, n=5).collect()
    }
    assert got[1] == (1, 1, 1.0)
    assert got[2] == (1, 1, 1.0)
    # d3 has two 5-token spans, none shared
    assert got[3] == (2, 0, 0.0)
    assert 4 not in got  # < 5 tokens → no spans → absent


def test_span_coverage_within_doc_repeat_not_shared(spark):
    # the same span repeated INSIDE one doc is not "shared": spans are
    # distinct per doc before the containing-doc count
    rows = [
        (1, "a b c d e a b c d e"),
        (2, "v w x y z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_shared for r in span_coverage(df, n=5).collect()}
    assert got[1] == 0
    assert got[2] == 0


def test_span_removal_keeps_canonical_copy(spark):
    from airflow_postgres_etl_spark.operators.dedup import remove_shared_spans

    # doc 2 repeats doc 1's full 5-token span → removed from 2, kept in 1;
    # doc 3 shares nothing; doc 4 too short for any span
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "one two three four five"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_fp)
        for r in remove_shared_spans(df, n=5).collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1] == (5, 0, md5("alpha beta gamma delta epsilon"))
    assert got[2] == (5, 5, md5(""))  # every position cut, canonical in 1
    assert got[3] == (5, 0, md5("one two three four five"))
    assert got[4] == (2, 0, md5("too short"))  # no spans → untouched


def test_span_removal_overlap_union(spark):
    from airflow_postgres_etl_spark.operators.dedup import remove_shared_spans

    # doc 2 embeds doc 1's span at offset 2: its positions 3..7 are
    # covered; surrounding tokens survive and rejoin
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "pre1 pre2 alpha beta gamma delta epsilon post1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_removed, r.cleaned_fp)
        for r in remove_shared_spans(df, n=5).collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1] == (0, md5("alpha beta gamma delta epsilon"))
    assert got[2] == (5, md5("pre1 pre2 post1"))


def test_cdc_chunks_edit_locality(spark):
    """CDC property: an edit disturbs only the chunk containing it —
    every other chunk keeps its exact identity, so a near-copy with one
    token changed still shares most chunks with the original."""
    from airflow_postgres_etl_spark.operators.dedup import cdc_chunk_stats

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six seven eight nine ten")
    toks = base.split()
    edited = toks.copy()
    edited[len(toks) // 2] = "EDITED"
    rows = [(1, base), (2, " ".join(edited)), (3, "unrelated words entirely distinct here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # mod=4 → expected ~4-token chunks over ~35 tokens → several chunks
    got = {r.doc_id: r for r in cdc_chunk_stats(df, mod=4).collect()}
    assert got[1].n_chunks >= 3
    # the pair shares all chunks except the (at most two) around the edit
    assert got[1].n_shared >= got[1].n_chunks - 2
    assert got[2].n_shared >= got[2].n_chunks - 2
    assert got[3].n_shared == 0


def test_psi_drift_flag_fires_on_shifted_distribution(spark):
    """PSI monitor: a value distribution that SHIFTS between the early
    and late halves flags drift; a stationary one does not."""
    import datetime as dt

    from airflow_postgres_etl_spark.plans.extensions import psi_value_drift

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 'shifted': early values near 0.05, late values near 0.95
    # 'stable': identical distribution in both halves
    for i in range(200):
        early = i < 100
        ts = t0 + dt.timedelta(hours=0 if early else 10)
        rows.append((ts, "shifted", 0.05 if early else 0.95))
        rows.append((ts, "stable", (i % 10) / 10.0))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = {r.event_type: (r.psi_nano, r.is_drift) for r in psi_value_drift(df).collect()}
    assert got["shifted"][1] is True
    assert got["stable"][1] is False
    assert got["shifted"][0] > got["stable"][0] >= 0


def test_psi_degenerate_range_matches_oracle(spark, tmp_path):
    """ADVICE r5: when every value is identical (vmax == vmin) the bucket
    floor is NULL; the rule is now an EXPLICIT coalesce-to-bucket-0 before
    least on both engines (previously least(9, NULL) silently picked 9 —
    same answer by accident on engines whose least skips NULLs, divergent
    on any engine whose least propagates them).  Differential at the
    degenerate point plus the invariant: identical halves → PSI 0."""
    import datetime as dt

    import duckdb

    from airflow_postgres_etl_spark.plans import ORACLE, QUERIES

    from .oracle_utils import compare, run_oracle

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=0 if i < 4 else 10), 7, "click", 0.5, "{}")
        for i in range(8)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", rows)
    path = str(tmp_path / "events.parquet")
    con.execute(f"COPY events TO '{path}' (FORMAT PARQUET)")
    con.close()

    spark_df = QUERIES["q_psi_value_drift"](spark, str(tmp_path))
    compare(spark_df, run_oracle(ORACLE["q_psi_value_drift"], str(tmp_path)))
    out = spark_df.collect()
    assert len(out) == 1
    assert out[0].psi_nano == 0 and out[0].is_drift is False


class TestDsirSelect:
    def _frame(self, spark):
        # target speaks {alpha..delta}; pool doc 1 speaks target words,
        # pool doc 2 an unrelated vocabulary, pool doc 3 is empty
        rows = [
            (100, True, "alpha beta gamma delta alpha beta"),
            (101, True, "beta gamma delta alpha gamma"),
            (1, False, "alpha beta gamma delta"),
            (2, False, "zulu yankee xray whiskey victor uniform"),
            (3, False, ""),
        ]
        return spark.createDataFrame(rows, ["doc_id", "tgt", "text"])

    def _grams(self):
        from pyspark.sql import functions as F

        from airflow_postgres_etl_spark.operators.text import tokens_expr

        w = tokens_expr()
        return w  # unigrams suffice for the unit tests

    def test_targetlike_doc_outranks_unrelated(self, spark):
        from pyspark.sql import functions as F

        from airflow_postgres_etl_spark.operators.selection import dsir_select

        out = dsir_select(
            self._frame(spark),
            is_target=F.col("tgt"),
            grams=self._grams(),
            k=2,
            n_buckets=64,
        ).collect()
        got = {r.doc_id: r.logw for r in out}
        # empty doc carries no evidence -> never selected
        assert 3 not in got
        # the doc sharing the target vocabulary scores strictly higher
        assert got[1] > got[2]

    def test_deterministic_across_runs(self, spark):
        from pyspark.sql import functions as F

        from airflow_postgres_etl_spark.operators.selection import dsir_select

        def run():
            return [
                (r.doc_id, r.logw, r.sel_key)
                for r in dsir_select(
                    self._frame(spark),
                    is_target=F.col("tgt"),
                    grams=self._grams(),
                    k=2,
                    n_buckets=64,
                ).collect()
            ]

        assert run() == run()

    def test_k_caps_selection(self, spark):
        from pyspark.sql import functions as F

        from airflow_postgres_etl_spark.operators.selection import dsir_select

        out = dsir_select(
            self._frame(spark),
            is_target=F.col("tgt"),
            grams=self._grams(),
            k=1,
            n_buckets=64,
        ).collect()
        assert len(out) == 1

    def test_corpus_tokenized_once_reused_exchange(self, spark):
        """The (doc, bucket) aggregate's exchange must be computed ONCE
        and reused by the second consumer (r12, VERDICT r11 task 1): the
        polarity rides the aggregate as max(__t) so no polarity filter
        can be pushed into the scan, and the explicit isNotNull(__b)
        keeps both consumer subtrees canonically identical (the per-doc
        consumer's join would otherwise infer isnotnull on its side
        only, splitting the stage).  Checked on the EXECUTED plan —
        static dumps never show AQE runtime stage reuse."""
        from pyspark.sql import functions as F

        from airflow_postgres_etl_spark.operators.selection import dsir_select

        out = dsir_select(
            self._frame(spark),
            is_target=F.col("tgt"),
            grams=self._grams(),
            k=2,
            n_buckets=64,
        )
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "isFinalPlan=true" in plan, plan
        assert final.count("ReusedExchange") == 1, final
        # one tokenize+explode pass over the corpus, not one per consumer
        assert final.count("Generate explode") == 1, final
