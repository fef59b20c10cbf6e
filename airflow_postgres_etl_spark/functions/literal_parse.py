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


def _jvm_normalized(c: Column) -> Column:
    c = F.regexp_replace(c, r"'", '"')
    c = F.regexp_replace(c, r"\bNone\b", "null")
    c = F.regexp_replace(c, r"\bTrue\b", "true")
    return F.regexp_replace(c, r"\bFalse\b", "false")


def _fast_path_safe(c: Column) -> Column:
    """True iff the pure-JVM quote-swap normalization is *provably* correct
    for this string:

    - no double quote and no backslash anywhere → every string literal in
      the repr is a plain single-quoted run (``'[^']*'`` tokenization is
      exact), so the global ``'``→``"`` swap is exact;
    - no ``None``/``True``/``False`` inside any extracted string literal →
      the global keyword→JSON swaps touch only real Python keywords, never
      text content.  (A plain ``'.*None.*'`` regex would be wrong: it cannot
      tell intra-string from *between*-string regions like ``': None, '``.)
    - outside string literals, only JSON-compatible syntax remains: the
      three keywords plus ``[]{}:,`` whitespace and plain decimal numbers.
      This provably rejects every ``ast.literal_eval``-only construct the
      quote-swap cannot translate — tuples ``(1, 2)``, sets ``{1, 2}``
      (enforced via ``{`` must open a string-keyed or empty dict),
      ``Ellipsis``/``...``, and exotic numerics (``0x1f``, ``1_000``,
      ``1j``, ``inf``, ``nan``) — all of which would otherwise survive the
      swap as invalid JSON and null the row under PERMISSIVE ``from_json``
      while the safe path parses them.

    Everything else (≈ rows whose free-text content contains quotes,
    backslashes, or a bare keyword) falls back to the Python
    ``ast.literal_eval`` path.  Real CDC payloads (hex ids + plain text)
    pass the gate almost always, so the Arrow/Python cost becomes rare
    instead of per-row.
    """
    no_quote_escape = ~c.rlike(r'["\\]')
    literals = F.regexp_extract_all(c, F.lit(r"'([^']*)'"), F.lit(1))
    keyword_inside_string = F.exists(
        literals, lambda x: x.rlike(r"None|True|False")
    )
    # With no_quote_escape held, `'[^']*'` tokenization is exact, so removing
    # string literals leaves exactly the structural syntax between values.
    stripped = F.regexp_replace(c, r"'[^']*'", "")
    stripped = F.regexp_replace(stripped, r"\b(None|True|False)\b", "")
    json_safe_syntax = ~stripped.rlike(r"[^\[\]{}:,\s0-9eE+.\-]") & ~stripped.rlike(
        r"\.\."
    )
    # Every `{` must open an empty or string-keyed dict, never a set literal.
    # String literals are collapsed to '' (not removed) so a dict's opening
    # brace is still followed by its string key's quote.
    collapsed = F.regexp_replace(c, r"'[^']*'", "''")
    dict_opens_ok = ~collapsed.rlike(r"\{\s*[^'}\s]")
    return no_quote_escape & ~keyword_inside_string & json_safe_syntax & dict_opens_ok


def parse_events(col: str | Column, *, mode: str = "safe") -> Column:
    """T4: string column → ``array<struct<...>>`` typed per ``EVENT_ARRAY``.

    Expression-level modes (the DataFrame-level fast/slow split lives in
    ``operators.ingest.explode_events`` because a Python UDF inside a
    ``when()`` branch is still evaluated for every row — Spark extracts
    UDFs into an ArrowEvalPython stage ahead of the conditional):

    - ``"safe"`` (default): the Python literal parser — correctness
      reference, handles any content.
    - ``"fast_unsafe"``: pure-JVM normalization — exact ONLY where
      :func:`_fast_path_safe` holds; callers must gate rows themselves.
    """
    c = F.col(col) if isinstance(col, str) else col
    if mode == "fast_unsafe":
        return F.from_json(_jvm_normalized(c), EVENT_ARRAY)
    if mode == "safe":
        return F.from_json(pyrepr_to_json(c), EVENT_ARRAY)
    raise ValueError(f"unknown parse mode: {mode!r}")


def fast_path_gate(col: str | Column) -> Column:
    """Public alias of the fast-path safety predicate (null-safe: NULL
    payloads report False and take the safe path, which yields null)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(_fast_path_safe(c), F.lit(False))
