"""Local differential harness: run a Spark query and its DuckDB oracle on
the same parquet tables and compare the way the driver does — row count,
column names, and an order-insensitive value comparison with columns sorted
by name.  Used by tests so every ``queries()`` entry is verified before the
driver ever sees it."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from airflow_postgres_etl_spark.schemas import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        for t in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime as _dt

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        # Spark DATE columns arrive as object dtype holding datetime.date
        # while DuckDB DATE fetches as datetime64 — same driver-level value;
        # normalize to datetime64 so the dtype-class gate compares like
        # with like (driver r5 confirms date-vs-datetime pairs hash equal).
        if s.dtype == object and s.map(
            lambda v: v is None or isinstance(v, _dt.date)
        ).all() and s.notna().any():
            s = pd.to_datetime(s)
            df[c] = s
        if pd.api.types.is_datetime64_any_dtype(s):
            # strip tz for naive comparison (Spark session TZ pinned to UTC)
            try:
                df[c] = s.dt.tz_localize(None)
            except TypeError:
                df[c] = s
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def _dtype_class(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "integer"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(spark_df, oracle_df: pd.DataFrame, *, float_tol: float = 0.0) -> None:
    got = _canon(spark_df.toPandas())
    exp = _canon(oracle_df)
    assert list(got.columns) == list(exp.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(exp.columns)}"
    )
    # Dtype-class gate: the driver hashes raw values, so an integer Spark
    # column against a float oracle column (e.g. DuckDB windowed sum(BIGINT)
    # -> HUGEINT -> pandas float64) hash-mismatches even when every value is
    # numerically equal.  Catch that typing drift locally instead of letting
    # `0 == 0.0` pass the value comparison below (round-5 blind spot).
    for c in got.columns:
        gc, ec = _dtype_class(got[c]), _dtype_class(exp[c])
        assert gc == ec, (
            f"dtype-class mismatch in column {c!r}: spark={gc} ({got[c].dtype}) "
            f"oracle={ec} ({exp[c].dtype}) — cast the oracle (or the query) so "
            f"integer meets integer; the driver's value hash is dtype-strict"
        )
    assert len(got) == len(exp), f"row count: spark={len(got)} oracle={len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ok = [
                (pd.isna(a) and pd.isna(b))
                or (
                    not pd.isna(a)
                    and not pd.isna(b)
                    and (a == b or math.isclose(a, b, rel_tol=0, abs_tol=float_tol))
                )
                for a, b in zip(g.tolist(), e.tolist())
            ]
            assert all(ok), _diff_msg(c, got, exp, ok)
        else:
            same = (g.fillna("\0NULL") == e.fillna("\0NULL")) if g.dtype == object else (
                g.isna() == e.isna()
            ) & ((g == e) | g.isna())
            assert bool(same.all()), _diff_msg(c, got, exp, same.tolist())


def _diff_msg(col: str, got: pd.DataFrame, exp: pd.DataFrame, ok) -> str:
    bad = [i for i, v in enumerate(ok) if not v][:5]
    rows = [
        f"  row {i}: spark={got.iloc[i].to_dict()} oracle={exp.iloc[i].to_dict()}"
        for i in bad
    ]
    return f"value mismatch in column {col!r}:\n" + "\n".join(rows)
