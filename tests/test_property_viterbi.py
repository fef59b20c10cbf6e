"""Independent Viterbi differential: the unrolled DP (and its DuckDB
twin) are emitted by ONE generator (`unigram.dp_layers`), so a
generator bug would pass the engine-vs-oracle differential on both
sides.  This test breaks that circularity — a from-scratch Python
Viterbi over random words and ARBITRARY piece costs must match the
Spark DP's pieces and total cost exactly (including the documented
tie rule: smallest back-pointer = longest piece wins)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_postgres_etl_spark.operators.unigram import (
    INF,
    L_MAX,
    P_MAX,
    viterbi_segment_costed,
)


def _py_viterbi(word: str, cost: dict[str, int]):
    n = len(word)
    best = [0] + [None] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        cands = [
            (best[j] + cost.get(word[j:i], INF), j)
            for j in range(max(0, i - P_MAX), i)
        ]
        b = min(c for c, _ in cands)
        best[i] = b
        back[i] = min(j for c, j in cands if c == b)
    pieces, p = [], n
    while p > 0:
        q = back[p]
        pieces.append(word[q:p])
        p = q
    return list(reversed(pieces)), best[n]


words_strategy = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=L_MAX),
    min_size=1, max_size=6, unique=True,
)
# arbitrary multi-char pieces with arbitrary costs; single chars always
# present so every word stays segmentable
pieces_strategy = st.dictionaries(
    st.text(alphabet="ab", min_size=2, max_size=P_MAX),
    st.integers(min_value=0, max_value=10_000_000),
    max_size=8,
)
char_costs_strategy = st.fixed_dictionaries(
    {"a": st.integers(0, 10_000_000), "b": st.integers(0, 10_000_000)}
)


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(words=words_strategy, multi=pieces_strategy, chars=char_costs_strategy)
def test_unrolled_dp_matches_python_model(spark, words, multi, chars):
    cost = {**multi, **chars}
    wdf = spark.createDataFrame([(w, 1) for w in words], "word string, freq long")
    vdf = spark.createDataFrame(
        [(p, 1, c) for p, c in cost.items()], "piece string, cnt long, cost long"
    )
    got = {
        r["word"]: (list(r["pieces"]), r["wcost"])
        for r in viterbi_segment_costed(wdf, vdf).collect()
    }
    for w in words:
        want_pieces, want_cost = _py_viterbi(w, cost)
        assert got[w] == (want_pieces, want_cost), (
            f"word={w!r} cost={cost}"
        )
