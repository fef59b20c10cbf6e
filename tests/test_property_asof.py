"""Property-based differential: the distributed as-of join must equal
pd.merge_asof on arbitrary interleaved keyed time series, for every
direction x tolerance combination (ties, duplicates-across-keys, empty
sides and all)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_postgres_etl_spark.operators.joins import asof_join

# integer second offsets keep timestamps exact in both engines
ts_strategy = st.integers(min_value=0, max_value=500)
key_strategy = st.sampled_from(["k1", "k2", "k3"])

left_rows = st.lists(
    st.tuples(key_strategy, ts_strategy), min_size=0, max_size=12
)
# right side must be unique per (key, ts) — the operator's documented
# precondition — so draw dicts keyed by (key, ts)
right_rows = st.dictionaries(
    st.tuples(key_strategy, ts_strategy), st.integers(0, 999), max_size=12
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows, direction_i=st.integers(0, 2),
       tol=st.sampled_from([None, 0, 30, 100]))
def test_asof_matches_pandas(spark, lrows, rrows, direction_i, tol):
    direction = ("backward", "forward", "nearest")[direction_i]
    base = pd.Timestamp("2024-01-01")
    lpd = pd.DataFrame(
        {
            "id": range(len(lrows)),
            "k": [k for k, _ in lrows],
            "t": [base + pd.Timedelta(seconds=s) for _, s in lrows],
        }
    )
    rpd = pd.DataFrame(
        {
            "k": [k for k, _ in rrows],
            "t": [base + pd.Timedelta(seconds=s) for _, s in rrows],
            "payload": list(rrows.values()),
        }
    )
    if lpd.empty:
        return  # Spark can't infer schema from an empty python frame

    left = spark.createDataFrame(lpd)
    right = (
        spark.createDataFrame(rpd)
        if not rpd.empty
        else spark.createDataFrame([], "k string, t timestamp, payload long")
    )
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="t",
        payload_cols=["payload"], direction=direction, tolerance=tol,
    )
    got = {r.id: r.payload for r in out.collect()}

    if rpd.empty:
        exp = {int(i): None for i in lpd["id"]}
    else:
        exp_df = pd.merge_asof(
            lpd.sort_values(["t", "id"]),
            rpd.sort_values("t"),
            on="t", by="k", direction=direction,
            tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
        )
        exp = {
            int(r.id): (None if pd.isna(r.payload) else int(r.payload))
            for r in exp_df.itertuples()
        }
    assert got == exp, (direction, tol)
