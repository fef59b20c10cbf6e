"""Property-based tests (hypothesis) for the Python-literal event parser —
the SURVEY §7 'hard part (a)': arbitrary free text (quotes, tabs, accents,
newlines) must round-trip repr → parse → struct exactly."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_postgres_etl_spark.operators.ingest import (
    explode_events,
    flatten_event_struct,
)

text_strategy = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    min_size=0,
    max_size=40,
)

event_strategy = st.fixed_dictionaries(
    {
        "createdAt": st.fixed_dictionaries(
            {"$date": st.integers(min_value=0, max_value=4_000_000_000_000)}
        ),
        "trackingCode": text_strategy,
        "status": st.one_of(st.none(), text_strategy),
        "description": text_strategy,
        "trackerType": text_strategy,
        "from": text_strategy,
        "to": text_strategy,
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.lists(event_strategy, max_size=4), min_size=1, max_size=6),
    st.sampled_from(["auto", "safe"]),
)
def test_parser_roundtrip(spark, rowset, mode):
    rows = [(str(i), repr(events)) for i, events in enumerate(rowset)]
    df = spark.createDataFrame(rows, ["oid__id", "array_trackingEvents"])
    flat = flatten_event_struct(explode_events(df, mode=mode))
    got: dict[str, list] = {}
    for r in flat.collect():
        got.setdefault(r["oid__id"], []).append(r)
    for i, events in enumerate(rowset):
        out = got[str(i)]
        if not events:
            assert len(out) == 1 and out[0]["trackingCode"] is None
            continue
        assert len(out) == len(events)
        import datetime as dt

        def millis(t):
            # exact integer arithmetic — float .timestamp() truncates ulps
            return (t - dt.datetime(1970, 1, 1)) // dt.timedelta(milliseconds=1)

        def norm_status(s):
            return "\x00NONE" if s is None else s

        got_set = sorted(
            (millis(r["eventCreatedAt"]), r["description"], r["from"],
             r["to"], norm_status(r["status"]))
            for r in out
        )
        exp_set = sorted(
            (ev["createdAt"]["$date"], ev["description"], ev["from"],
             ev["to"], norm_status(ev["status"]))
            for ev in events
        )
        assert got_set == exp_set


def test_gate_classifies_tricky_payloads(spark):
    """Rows the JVM fast path would corrupt MUST fail the gate."""
    from pyspark.sql import functions as F

    from airflow_postgres_etl_spark.functions.literal_parse import fast_path_gate

    cases = [
        # (payload, gate_expected)
        (repr([{"createdAt": {"$date": 1}, "trackingCode": "ab12",
                "status": None, "description": "plain text",
                "trackerType": "t", "from": "f", "to": "t2"}]), True),
        ("[]", True),
        (None, False),                                   # null payload → safe path
        (repr([{"description": 'has "quotes"'}]), False),  # double quotes
        (repr([{"description": "back\\slash"}]), False),   # backslash
        (repr([{"description": "None of the above"}]), False),  # in-string None
        (repr([{"status": None, "description": "ok"}]), True),  # real None ok
        # Python keywords OUTSIDE strings are normalized (True→true) — pass.
        ("[{'flag': True, 'off': False}]", True),
        # ... but inside a string literal the swap would corrupt text — fail.
        ("[{'note': 'a True story'}]", False),
        ("[{'note': 'False alarm'}]", False),
        # literal_eval-only constructs the quote-swap can't translate — fail.
        ("[(1, 2)]", False),                              # tuple
        ("[{1, 2}]", False),                              # set literal
        ("[{'a': 0x1f}]", False),                         # hex int
        ("[{'a': 1_000}]", False),                        # underscore numeric
        ("[{'a': 1j}]", False),                           # complex
        ("[...]", False),                                 # Ellipsis
        ("[{'a': 1e5}]", True),                           # sci-notation is JSON
    ]
    df = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(cases)], ["i", "array_trackingEvents"]
    )
    got = {
        r.i: r.g
        for r in df.select("i", fast_path_gate("array_trackingEvents").alias("g")).collect()
    }
    for i, (_, expected) in enumerate(cases):
        assert got[i] == expected, f"case {i}: gate={got[i]} expected={expected}"
