"""Vector math over ``array<float>`` columns — pure JVM expressions.

Built from ``zip_with``/``aggregate`` higher-order functions so the hot
path never leaves whole-stage codegen; no Python UDF, no driver collect.
Inputs are cast to double element-wise so Spark and the DuckDB oracle
accumulate in the same precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dcol(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Sum of element-wise products, accumulated left-to-right in double."""
    prods = F.zip_with(_dcol(a), _dcol(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_expr(a: str | Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_similarity_expr(a: str | Column, b: str | Column) -> Column:
    """NULL for zero-magnitude vectors (ANSI mode would otherwise raise
    DIVIDE_BY_ZERO; SQL oracles mirror with ``nullif``)."""
    den = l2_norm_expr(a) * l2_norm_expr(b)
    return dot_expr(a, b) / F.nullif(den, F.lit(0.0))
