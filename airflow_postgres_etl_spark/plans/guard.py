"""Plan guards — assert a DataFrame's PHYSICAL plan has the shape you
meant before it runs on 100 TB.

The repo's own test suite gates every headline query this way
(tests/test_plans.py); this module is the same checks as a production
API, so a pipeline can fail fast at submit time ("this join degenerated
to a cross product", "Python crept into the hot path") instead of
six hours into a cluster run.  Typical use::

    from airflow_postgres_etl_spark.plans.guard import assert_plan

    df = build_my_pipeline(spark)
    assert_plan(df)                      # no cartesian, no row-Python
    assert_plan(df, require=["BroadcastHashJoin"])   # dim must broadcast
    df.write...

Checks run on the optimized PHYSICAL plan string — zero execution, zero
data read (parquet footers only, already needed for analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Fragments that are scale bugs in virtually every pipeline: a cross
#: join that will square the data, and row-at-a-time Python (the
#: 10-100x-slower non-Arrow path).  Arrow-batched Python
#: (ArrowEvalPython / mapInPandas) is NOT in the default list — it is
#: the sanctioned slow path for genuinely non-JVM work.
DEFAULT_FORBID = ("CartesianProduct", "BatchEvalPython")


class PlanShapeError(AssertionError):
    """A physical plan violated a declared shape constraint."""


def physical_plan(df: DataFrame) -> str:
    """The executed-plan string the guards match against."""
    return df._jdf.queryExecution().executedPlan().toString()


def assert_plan(
    df: DataFrame,
    forbid: tuple[str, ...] | list[str] = DEFAULT_FORBID,
    require: tuple[str, ...] | list[str] = (),
    max_shuffles: int | None = None,
) -> str:
    """Raise :class:`PlanShapeError` unless the plan satisfies every
    constraint; returns the plan string on success (handy for logging).

    - ``forbid``: plan fragments that must NOT appear.
    - ``require``: fragments that MUST appear (e.g. ``BroadcastHashJoin``
      when a dim is supposed to broadcast, ``PushedFilters`` when a
      predicate must reach the scan).
    - ``max_shuffles``: ceiling on ``Exchange`` operators — the number
      that actually prices a plan at scale.  AQE reuse is counted once
      (``ReusedExchange`` is excluded).
    """
    plan = physical_plan(df)
    for frag in forbid:
        if frag in plan:
            raise PlanShapeError(
                f"forbidden plan fragment {frag!r} present:\n{plan}"
            )
    for frag in require:
        if frag not in plan:
            raise PlanShapeError(
                f"required plan fragment {frag!r} missing:\n{plan}"
            )
    if max_shuffles is not None:
        n = sum(
            line.lstrip().lstrip("+-: ").startswith("Exchange")
            for line in plan.splitlines()
        )
        if n > max_shuffles:
            raise PlanShapeError(
                f"plan has {n} Exchange stages (max {max_shuffles}):\n{plan}"
            )
    return plan
