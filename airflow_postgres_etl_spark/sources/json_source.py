"""JSON-Lines directory source — the CSV source's contract (S1–S4: sorted
listing, pinned schema, executor-side lineage) over the other ubiquitous
CDC/export interchange format.

The reference ingests only CSV (`postgres.py:158-171`); real fleets emit
the same Mongo-CDC payloads as JSONL (one object per line — the
streaming-friendly framing: splittable, appendable, no multi-line
document state).  Spark-first identically: one multi-file ``spark.read
.json`` with a PINNED schema — never schema inference, which at 100 TB
costs a full extra pass over the data and can silently widen types
between runs (a correctness hazard for the differential: int64 columns
inferred as double on a file containing only nulls).

``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` keeps malformed
lines visible instead of dropped: callers route non-null
``_corrupt_record`` rows to quarantine — the same crash-vs-quarantine
posture as the literal parser's ``mode='safe'``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .csv_source import with_file_name

CORRUPT_COL = "_corrupt_record"


def list_json_files(path: str) -> list[str]:
    """S1+S2 for JSONL: sorted ``.jsonl``/``.json`` file names
    (lexicographic == chronological under the naming contract)."""
    return sorted(
        f for f in os.listdir(path) if f.endswith((".jsonl", ".json"))
    )


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
) -> DataFrame:
    """Pinned-schema JSONL scan with lineage and corrupt-line capture.

    The passed ``schema`` is augmented with ``_corrupt_record string``;
    a malformed line yields one row with every data column null and the
    raw line in ``_corrupt_record`` (PERMISSIVE), so ingest can count,
    quarantine, or fail on them explicitly — silent row loss is the one
    unacceptable behavior for a lineage-tracked ingest.
    """
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must not predefine {CORRUPT_COL}")
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    df = reader.json(paths if isinstance(paths, str) else list(paths))
    return with_file_name(df)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without the corrupt column, quarantined rows).

    The quarantine frame keeps every column (data columns are null on a
    corrupt row): Spark refuses plans whose JSON-scan projection is the
    corrupt column alone (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the scan
    would have nothing to parse-fail against), so narrowing to
    ``(_corrupt_record, fileName)`` here would push exactly that illegal
    projection.  Callers who want just the raw line should materialize
    first (write/cache), per the Spark documentation."""
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    return good, bad
