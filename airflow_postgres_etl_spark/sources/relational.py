"""Relational source: read a table/query from PostgreSQL into Spark
through the engine's own wire client — no JDBC jar, no psycopg.

Scope: DRIVER-side, one connection, whole result in driver memory —
the right tool for DIMENSION-sized tables (the kind you broadcast into
a join) and for verification reads against the S9 sink's target.  A
100 TB fact table does not come through here; that is executor-parallel
JDBC's job the day a driver jar exists.  The cap enforces the contract
loudly instead of letting a fat SELECT OOM the driver.

Types map from the result's RowDescription OIDs (pg_type.dat, the
public catalog) onto Spark SQL types; anything unmapped arrives as the
server's text rendering in a string column — lossless by default, same
posture as the 3-type sink model.
"""

from __future__ import annotations

import decimal
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: type OID -> Spark type for the OIDs pgwire decodes natively.
_SPARK_TYPES = {
    16: T.BooleanType(),  # bool
    20: T.LongType(),  # int8
    21: T.IntegerType(),  # int2
    23: T.IntegerType(),  # int4
    26: T.LongType(),  # oid
    700: T.DoubleType(),  # float4 (widened; Spark float would re-narrow)
    701: T.DoubleType(),  # float8
    1700: T.DecimalType(38, 18),  # numeric
    1114: T.TimestampNTZType(),  # timestamp
    1184: T.TimestampType(),  # timestamptz
    1082: T.DateType(),  # date
}

DEFAULT_MAX_ROWS = 1_000_000


def read_relational_query(
    spark: SparkSession,
    url: str,
    sql: str,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> DataFrame:
    """One SELECT over the wire -> a typed Spark DataFrame.

    The schema comes from the server's RowDescription, so the frame is
    usable directly in joins (ids are longs, timestamps are timestamps
    — not a stringly-typed re-parse).  Raises when the result exceeds
    ``max_rows``: a silent truncation would make a verification read
    lie, and a bigger read belongs on an executor-parallel path.  The
    cap is enforced SERVER-side (the query is wrapped in a
    ``LIMIT max_rows+1`` subselect) so a fat SELECT cannot OOM the
    driver before the check runs — the wire client buffers the whole
    result."""
    from .. import pgwire

    # newline before the closing paren: a query ending in a line
    # comment must not swallow the wrapper (r11 review)
    bounded = (
        f"SELECT * FROM ({sql.rstrip().rstrip(';')}\n) __bounded "
        f"LIMIT {int(max_rows) + 1}"
    )
    con = pgwire.connect(url)
    try:
        cur = con.cursor()
        cur.execute(bounded)
        rows = cur.fetchall()
        desc = cur.description or []
    finally:
        con.close()
    if len(rows) > max_rows:
        raise ValueError(
            f"relational read exceeds max_rows={max_rows}; this "
            "driver-side source is for dimension-sized tables — raise "
            "max_rows deliberately or move the read to an "
            "executor-parallel JDBC path"
        )
    fields = []
    norm_cols: list[tuple[int, object]] = []
    for i, (name, toid, *_rest) in enumerate(desc):
        stype = _SPARK_TYPES.get(toid, T.StringType())
        fields.append(T.StructField(name, stype, True))
        norm_cols.append((i, stype))
    # normalize values pgwire decodes more precisely than the column
    # type (Decimal scale) or leaves as text (unmapped OIDs); values a
    # mapped column type CANNOT represent (numeric NaN/Infinity or
    # magnitudes past DecimalType(38,18), timestamp 'infinity'/BC dates
    # — legal in Postgres, inexpressible in the Spark type) raise a
    # NAMED error with the fix, never a silent null or an opaque
    # createDataFrame failure deep in Spark
    def norm(row):
        out = list(row)
        for i, stype in norm_cols:
            v = out[i]
            if v is None:
                continue
            if isinstance(stype, T.StringType):
                if not isinstance(v, str):
                    out[i] = str(v)
            elif isinstance(stype, T.DecimalType) and isinstance(
                v, Decimal
            ):
                try:
                    if not v.is_finite():  # NaN quantizes QUIETLY
                        raise ValueError(v)
                    # quantize under a wide-enough context: the default
                    # 28-digit precision falsely rejects legal values
                    # >= 1e10 (20 int digits + 18 scale = 38 needed);
                    # the adjusted() check is the REAL (38,18) bound
                    with decimal.localcontext(decimal.Context(prec=57)):
                        q = v.quantize(Decimal("1E-18"))
                    if q.adjusted() >= 20:
                        raise ValueError(v)
                    out[i] = q
                except (ArithmeticError, ValueError):
                    raise ValueError(
                        f"column {desc[i][0]!r}: numeric value {v} "
                        "cannot be represented as DECIMAL(38,18) — "
                        "cast it in the SQL (e.g. ::float8 or ::text) "
                        "to choose the loss explicitly"
                    ) from None
            elif isinstance(v, str):
                # a mapped non-string type whose wire text didn't
                # decode (timestamp 'infinity', BC dates)
                raise ValueError(
                    f"column {desc[i][0]!r}: value {v!r} is not "
                    f"representable as Spark {stype.simpleString()} — "
                    "cast it in the SQL (e.g. ::text) to read it as a "
                    "string"
                )
        return tuple(out)

    return spark.createDataFrame(
        [norm(r) for r in rows], T.StructType(fields)
    )


def read_relational_table(
    spark: SparkSession,
    url: str,
    table: str,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> DataFrame:
    """``SELECT * FROM "table"`` via :func:`read_relational_query` —
    the read-back twin of ``sink.keyed_overwrite_jdbc``'s target (used
    by verification reads and dim loads)."""
    safe = table.replace('"', '""')
    return read_relational_query(
        spark, url, f'SELECT * FROM "{safe}"', max_rows=max_rows
    )
