"""Safe Python-literal array parser (reference T4).

The reference parses ``array_trackingEvents`` — a **Python-repr** string
(single quotes, ``None``, nested ``{'$date': ms}``) — with bare ``eval``
(reference ``dags/datahelper/postgres.py:185``), an arbitrary-code-execution
hazard.  Spark-first replacement, two stages:

1. ``pyrepr_to_json`` — an Arrow-batched **pandas UDF** (string → string)
   that ``ast.literal_eval``s the repr and re-serializes as strict JSON.
   String-in/string-out keeps the Arrow transfer trivial and is immune to
   embedded quotes/tabs/accents that break regex-based normalization.
2. ``from_json`` with the pinned ``EVENT_ARRAY`` schema — JVM-side,
   whole-stage-codegen'd struct construction.

So the unavoidable Python cost is one linear pass per string; all struct
work stays on the JVM.  A pure-JVM ``regexp_replace`` fast path is provided
for well-behaved rows (no embedded quotes) but the literal_eval path is the
correctness reference (SURVEY §7 hard part (a)).
"""

from __future__ import annotations

import ast
import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EVENT_ARRAY


def _one(value: str | None) -> str | None:
    if value is None:
        return None
    s = value.strip()
    if not s:
        return None
    try:
        obj = ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return None
    if not isinstance(obj, list):
        return None
    return json.dumps(obj, ensure_ascii=False, default=str)


@F.pandas_udf(T.StringType())
def pyrepr_to_json(s: pd.Series) -> pd.Series:
    """Python-repr list-of-dicts → strict JSON string (None on parse failure)."""
    return s.map(_one)


def parse_events(col: str | Column, *, fast_unsafe: bool = False) -> Column:
    """T4: string column → ``array<struct<...>>`` typed per ``EVENT_ARRAY``.

    ``fast_unsafe=True`` uses the pure-JVM regex normalization (single→double
    quotes, ``None``→``null``); only valid when payload strings contain no
    embedded quotes — kept for benchmarking, not the default.
    """
    c = F.col(col) if isinstance(col, str) else col
    if fast_unsafe:
        normalized = F.regexp_replace(
            F.regexp_replace(c, r"'", '"'), r"\bNone\b", "null"
        )
        return F.from_json(normalized, EVENT_ARRAY)
    return F.from_json(pyrepr_to_json(c), EVENT_ARRAY)
