"""Property-based differential for line-level boilerplate removal: both
join branches of `remove_duplicate_lines` must match a pure-Python
model on arbitrary corpora (line sharing, blank/whitespace lines,
unicode, fully-boilerplate docs)."""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_postgres_etl_spark.operators.dedup import remove_duplicate_lines

# small alphabet FORCES cross-document line collisions; whitespace-only
# lines exercise the blank-is-layout rule
line_strategy = st.one_of(
    st.text(alphabet="ab ", min_size=0, max_size=4),
    st.sampled_from(["", "  ", "\t", "boiler", "ünïcode"]),
)
doc_strategy = st.lists(line_strategy, min_size=0, max_size=6)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=8)


def _model(docs: list[list[str]], min_dup: int):
    """The spec: count non-blank lines by trimmed text corpus-wide;
    drop every occurrence of lines recurring >= min_dup; blanks kept."""
    counts = Counter(
        ln.strip()
        for lines in docs
        for ln in lines
        if ln.strip() != ""
    )
    heavy = {t for t, c in counts.items() if c >= min_dup}
    out = {}
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if ln.strip() == "" or ln.strip() not in heavy]
        out[i] = (
            len(lines),
            len(kept),
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=corpus_strategy, min_dup=st.integers(min_value=2, max_value=3))
def test_both_branches_match_python_model(spark, corpus, min_dup):
    rows = [(i, "\n".join(lines)) for i, lines in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = _model(
        # split("a\nb", "\n") and the joined text round-trip exactly:
        # a doc of k lines re-splits to k lines (even empty ones)
        [r[1].split("\n") for r in rows],
        min_dup,
    )
    for threshold in (10_000_000, 0):  # broadcast branch, sort-merge branch
        got = {
            r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_fp"])
            for r in remove_duplicate_lines(
                docs, min_dup=min_dup, broadcast_threshold=threshold
            ).collect()
        }
        assert got == want, f"threshold={threshold}"
