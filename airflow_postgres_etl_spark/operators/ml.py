"""In-engine model training: logistic regression by full-batch gradient
descent — the "train the quality/language filter ON the corpus, IN the
warehouse" step (fastText-classifier niche) that otherwise forces an
export to a separate ML stack.

100 TB shape: one iteration = ONE map-side-combinable aggregate over the
feature frame (a handful of sums), weights travel as literals in the
next plan — the corpus never moves, never caches, and iteration count
is a small constant.  This is exactly how Spark MLlib's own LBFGS/GD
drivers are shaped (treeAggregate of gradients); here it is expressed
in plain DataFrame ops so the DuckDB oracle can replay it.

Exactness scheme (the repo's integer micro-unit convention, see the
NB classifier / BM25 / RRF): weights live in integer MICRO-units,
features are integer-valued, so every margin is an exact BIGINT; the
per-row sigmoid is floored to micro-units BEFORE the gradient sum, so
the only transcendental (exp) never enters a float accumulation —
gradients and weight updates are bit-exact across engines except at
the measure-zero floor boundary (the accepted threshold residual).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


def train_logreg_gd(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iterations: int = 3,
    lr_inv: int = 8,
) -> dict:
    """Full-batch GD from zero weights: ``iterations`` rounds of

        margin_i = sum_j w_j x_ij + b                (exact BIGINT)
        p_i      = floor(MICRO / (1 + exp(-margin_i/MICRO)))
        grad_j   = sum_i (p_i - y_i*MICRO) * x_ij    (exact BIGINT)
        w_j     -= floor(grad_j / (lr_inv * n))      (IEEE double div)

    Labels are 0/1; features must be integer-valued (counts).  Returns
    ``{"weights": {col: w_micro}, "bias": b_micro, "n": n}``.  Each
    iteration is one aggregate job; weights re-enter as literals.
    """
    n = feats.count()
    w = {c: 0 for c in feature_cols}
    bias = 0
    for _ in range(iterations):
        margin = F.lit(bias)
        for c in feature_cols:
            margin = margin + F.lit(w[c]) * F.col(c)
        p = F.floor(F.lit(float(MICRO)) / (1.0 + F.exp(-margin / F.lit(float(MICRO))))).cast("long")
        err = p - F.col(label_col) * F.lit(MICRO)
        aggs = [F.sum(err * F.col(c)).alias(c) for c in feature_cols]
        aggs.append(F.sum(err).alias("__bias"))
        g = feats.agg(*aggs).first()
        for c in feature_cols:
            w[c] -= math.floor(g[c] / (lr_inv * float(n)))
        bias -= math.floor(g["__bias"] / (lr_inv * float(n)))
    return {"weights": w, "bias": bias, "n": n}


def logreg_predictions(
    feats: DataFrame, model: dict, label_col: str = "y"
) -> DataFrame:
    """Adds ``margin`` (exact BIGINT) and ``pred`` (margin > 0)."""
    margin = F.lit(model["bias"])
    for c, wv in model["weights"].items():
        margin = margin + F.lit(wv) * F.col(c)
    return feats.withColumn("margin", margin.cast("long")).withColumn(
        "pred", (F.col("margin") > 0).cast("int")
    )
