"""Pinned schemas.

The reference infers schemas per file with ``pd.read_csv``
(reference ``dags/datahelper/postgres.py:169``); we pin them instead so the
scan never re-infers and Catalyst can prune/push down from the start.

Raw-ingest schema from reference ``data/extracted/*.csv`` header
(``Op,oid__id,createdAt,updatedAt,lastSyncTracker,array_trackingEvents``)
and the event-struct shape documented in SURVEY.md §1.1 / FIXTURES.md §1.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw CSV input (reference §1.1).  Epochs arrive as int64 seconds; the array
# column is a Python-repr string parsed later (operators.ingest.parse_events).
# ---------------------------------------------------------------------------
TRACKING_RAW = T.StructType(
    [
        T.StructField("Op", T.StringType(), True),
        T.StructField("oid__id", T.StringType(), True),
        T.StructField("createdAt", T.LongType(), True),
        T.StructField("updatedAt", T.LongType(), True),
        T.StructField("lastSyncTracker", T.LongType(), True),
        T.StructField("array_trackingEvents", T.StringType(), True),
    ]
)

# Nested Mongo extended-JSON date wrapper: {'$date': <epoch millis>}
# (reference ``postgres.py:139-140``).
MONGO_DATE = T.StructType([T.StructField("$date", T.LongType(), True)])

# One element of array_trackingEvents (SURVEY §1.1; FIXTURES §1).
# ``from``/``to`` are SQL reserved words — quoted everywhere downstream.
EVENT_STRUCT = T.StructType(
    [
        T.StructField("createdAt", MONGO_DATE, True),
        T.StructField("trackingCode", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("trackerType", T.StringType(), True),
        T.StructField("from", T.StringType(), True),
        T.StructField("to", T.StringType(), True),
    ]
)
EVENT_ARRAY = T.ArrayType(EVENT_STRUCT)

# ---------------------------------------------------------------------------
# Output tables (reference §1.2: ``tracking`` parent / ``events`` child).
# ---------------------------------------------------------------------------
TRACKING_COLUMNS = ["oid__id", "Op", "createdAt", "updatedAt", "lastSyncTracker"]
TRACKING_DATETIME_COLUMNS = ["createdAt", "updatedAt", "lastSyncTracker"]

EVENTS_COLUMNS = [
    "oid__id",
    "trackingCode",
    "status",
    "description",
    "trackerType",
    "from",
    "to",
    "eventCreatedAt",
]
AUDIT_COLUMNS = ["uploadDate", "fileName"]

TRACKING_OUT = T.StructType(
    [
        T.StructField("oid__id", T.StringType(), True),
        T.StructField("Op", T.StringType(), True),
        T.StructField("createdAt", T.TimestampType(), True),
        T.StructField("updatedAt", T.TimestampType(), True),
        T.StructField("lastSyncTracker", T.TimestampType(), True),
        T.StructField("uploadDate", T.TimestampType(), True),
        T.StructField("fileName", T.StringType(), True),
    ]
)

EVENTS_OUT = T.StructType(
    [
        T.StructField("oid__id", T.StringType(), True),
        T.StructField("trackingCode", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("trackerType", T.StringType(), True),
        T.StructField("from", T.StringType(), True),
        T.StructField("to", T.StringType(), True),
        T.StructField("eventCreatedAt", T.TimestampType(), True),
        T.StructField("uploadDate", T.TimestampType(), True),
        T.StructField("fileName", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Sink type system: the reference's 3-type model (String/Integer/DateTime,
# ``postgres.py:88-92``) mapped to Spark + JDBC DDL types.
# ---------------------------------------------------------------------------
SINK_TYPE_MAP = {
    "String": T.StringType(),
    "Integer": T.IntegerType(),
    "DateTime": T.TimestampType(),
}
SINK_DDL_MAP = {"String": "TEXT", "Integer": "INTEGER", "DateTime": "TIMESTAMP"}

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def create_columns_dict(
    columns: list[str],
    datetime_columns: list[str] | None = None,
    int_columns: list[str] | None = None,
) -> dict[str, str]:
    """Reference parity: ``create_columns_dict`` (``postgres.py:41-60``) —
    classify each column into the 3-type sink model; unlisted → String."""
    dt = set(datetime_columns or [])
    ints = set(int_columns or [])
    out: dict[str, str] = {}
    for c in columns:
        if c in dt:
            out[c] = "DateTime"
        elif c in ints:
            out[c] = "Integer"
        else:
            out[c] = "String"
    return out
