"""Parquet testdata loader + temp-view registration.

Gives both API surfaces the reference implies: DataFrame handles for the
operator library and named views for ``spark.sql`` (reference entry point C,
SURVEY §3.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

# Testdata parquet stores TIMESTAMP(NANOS,false) (int64), which Spark's
# parquet reader rejects outright.  With spark.sql.legacy.parquet.nanosAsLong
# the column arrives as long nanoseconds; convert losslessly to timestamp
# (data is microsecond-grained — verified no sub-microsecond components).
NANO_TS_COLUMNS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Make a FOREIGN SparkSession (e.g. the driver's own, passed into
    ``__spark_entry__.entry``/``queries``) able to read the testdata and
    compare against the UTC-naive oracle.  Both settings are session-scoped
    and verified settable post-hoc:

    - without ``nanosAsLong`` a vanilla session fails outright on
      ``events.parquet`` (PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS));
    - without a UTC session timezone every timestamp comparison against
      the oracle shifts by the host offset.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # read-only conf (unlikely): proceed with the session as-is


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in NANO_TS_COLUMNS.get(name, []):
        if c in df.columns and dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register each testdata table as a temp view so ``spark.sql`` works."""
    tables = load_tables(spark, sf_dir, names)
    for n, df in tables.items():
        df.createOrReplaceTempView(n)
    return tables
