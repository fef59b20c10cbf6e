"""KMV sketch: estimator accuracy vs exact, merge losslessness, and
Jaccard accuracy — the guarantees the oracle differential (determinism)
cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators import sketch as K
from airflow_postgres_etl_spark.operators.dedup import shingles_from_tokens
from airflow_postgres_etl_spark.operators.text import tokens_expr
from airflow_postgres_etl_spark.sources.parquet_source import load_table

from .conftest import SF_CORRECT

KK = 128


def _toks(spark):
    # 3-token shingles: ~1.1-1.6k distinct per source, so k=128 sketches
    # SATURATE and the estimator branch is actually exercised (the raw
    # token vocabulary is only 31 words — never fills a sketch)
    docs = load_table(spark, SF_CORRECT, "documents")
    return docs.select("source", tokens_expr().alias("w")).select(
        "source", F.explode(shingles_from_tokens(F.col("w"))).alias("tok")
    )


def test_kmv_estimate_accuracy(spark):
    """Relative error of the saturated estimator is ~1/sqrt(k); gate at
    3.5x that (k=128 -> ~31%, typical ~9%), per source."""
    toks = _toks(spark)
    sk = K.kmv_sketch(toks, ["source"], F.col("tok"), k=KK)
    exact = (
        toks.distinct().groupBy("source").agg(F.count("*").alias("exact"))
    )
    rows = (
        sk.join(exact, "source")
        .select("source", "exact", "n_k", K.kmv_estimate_expr(KK).alias("est"))
        .collect()
    )
    assert rows
    saturated = 0
    for r in rows:
        if r.n_k < KK:
            assert r.est == float(r.exact)  # below fill line: exact
        else:
            saturated += 1
            assert abs(r.est - r.exact) / r.exact < 3.5 / (KK**0.5), (
                r.source,
                r.exact,
                r.est,
            )
    assert saturated > 0  # the estimator branch must actually run


def test_kmv_merge_is_lossless_for_kmin(spark):
    """k-min of per-part sketches == k-min of the full set, exactly —
    the property that makes the sketch distributable."""
    toks = _toks(spark)
    direct = K.kmv_sketch(
        toks.withColumn("g", F.lit("all")), ["g"], F.col("tok"), k=KK
    ).collect()[0]
    per_source = K.kmv_sketch(toks, ["source"], F.col("tok"), k=KK)
    merged = K.kmv_merge_sketches(
        per_source.withColumn("g", F.lit("all")), ["g"], k=KK
    ).collect()[0]
    assert list(direct.ks) == list(merged.ks)
    assert (direct.n_k, direct.kth) == (merged.n_k, merged.kth)


def test_kmv_salting_does_not_change_result(spark):
    """The salted two-level top-k is a pure execution-shape choice."""
    toks = _toks(spark)
    a = K.kmv_sketch(toks, ["source"], F.col("tok"), k=KK, n_salts=1)
    b = K.kmv_sketch(toks, ["source"], F.col("tok"), k=KK, n_salts=32)
    ra = {r.source: list(r.ks) for r in a.collect()}
    rb = {r.source: list(r.ks) for r in b.collect()}
    assert ra == rb


def test_kmv_jaccard_accuracy(spark):
    """Sketch Jaccard vs exact token-set Jaccard per source pair."""
    toks = _toks(spark).distinct()
    sk = K.kmv_sketch(toks, ["source"], F.col("tok"), k=KK)
    a = sk.select(F.col("source").alias("sa"), F.col("ks").alias("ka"))
    b = sk.select(F.col("source").alias("sb"), F.col("ks").alias("kb"))
    cols = K.kmv_jaccard_cols(F.col("ka"), F.col("kb"), KK)
    est = {
        (r.sa, r.sb): r.j
        for r in a.join(b, F.col("sa") < F.col("sb"))
        .select("sa", "sb", cols["j_est"].alias("j"))
        .collect()
    }
    ta = toks.select(F.col("source").alias("sa"), "tok")
    tb = toks.select(F.col("source").alias("sb"), "tok")
    inter = (
        ta.join(tb, "tok")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.countDistinct("tok").alias("ni"))
    )
    sizes = toks.groupBy("source").agg(F.countDistinct("tok").alias("n"))
    exact = {
        (r.sa, r.sb): r.ni / (r.na + r.nb - r.ni)
        for r in inter.join(
            sizes.select(F.col("source").alias("sa"), F.col("n").alias("na")), "sa"
        )
        .join(sizes.select(F.col("source").alias("sb"), F.col("n").alias("nb")), "sb")
        .collect()
    }
    assert est
    for pair, j_est in est.items():
        j_true = exact.get(pair, 0.0)
        assert abs(j_est - j_true) < 0.15, (pair, j_true, j_est)


def test_kmv_plan_stays_jvm_side(spark):
    """No Python eval anywhere in the sketch plan; windows bounded."""
    toks = _toks(spark)
    plan = K.kmv_sketch(toks, ["source"], F.col("tok"), k=KK)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
