"""In-engine logistic regression (`operators.ml.train_logreg_gd`).

The driver query's differential (pipeline_train_logreg) proves the
integer micro-unit GD is hash-exact cross-engine on the real corpus
(where lang is metadata-random, so convergence to the majority prior is
the CORRECT outcome); these tests prove the learner actually LEARNS on
separable data, deterministically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.operators.ml import (
    logreg_predictions,
    train_logreg_gd,
)


def _separable(spark, n=400):
    """y=1 rows carry high x_a / low x_b, y=0 the reverse (integer
    counts, deterministic)."""
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 2).cast("int").alias("y"),
        (F.when(F.col("id") % 2 == 1, 5 + F.col("id") % 3)
         .otherwise(F.col("id") % 2)).cast("long").alias("x_a"),
        (F.when(F.col("id") % 2 == 0, 4 + F.col("id") % 2)
         .otherwise(0)).cast("long").alias("x_b"),
    )


def test_learns_separable_data(spark):
    feats = _separable(spark)
    model = train_logreg_gd(feats, ["x_a", "x_b"], iterations=3)
    assert model["weights"]["x_a"] > 0 > model["weights"]["x_b"]
    scored = logreg_predictions(feats, model)
    acc = scored.agg(
        F.avg((F.col("pred") == F.col("y")).cast("double"))
    ).first()[0]
    assert acc == 1.0


def test_deterministic_across_runs(spark):
    feats = _separable(spark, 300)
    m1 = train_logreg_gd(feats, ["x_a", "x_b"])
    m2 = train_logreg_gd(feats.repartition(7), ["x_a", "x_b"])
    # integer micro-unit scheme: bit-identical regardless of
    # partitioning (no float accumulation order anywhere)
    assert m1 == m2


def test_margins_are_exact_bigints(spark):
    feats = _separable(spark, 100)
    model = train_logreg_gd(feats, ["x_a", "x_b"])
    row = logreg_predictions(feats, model).first()
    expected = (
        model["weights"]["x_a"] * row["x_a"]
        + model["weights"]["x_b"] * row["x_b"]
        + model["bias"]
    )
    assert row["margin"] == expected
