"""Unigram-LM tokenizer (the SentencePiece / Kudo 2018 family), hard-EM
simplified, expressed as pure JVM expressions with an exact SQL twin.

This completes the tokenizer family next to BPE (extensions.py
``pipeline_bpe_merges``/``_encode``): BPE grows a vocab bottom-up by
merges; the unigram model starts from an over-complete SUBSTRING vocab
and segments every word by Viterbi under per-piece costs, then
re-estimates from the chosen segmentations.

Distribution shape (the BPE precedent): corpus-scale work is ONE word-
frequency shuffle; everything after runs on the Heaps'-law-bounded
distinct-word table with the piece-cost table broadcast as a single
map literal.  The Viterbi DP is UNROLLED over word positions
(``L_MAX`` columns of lateral aliases — whole-stage codegen, no UDF,
no recursion): for each prefix length i,

    best_i = min over j in [i-P_MAX, i)  of  best_j + cost(word[j+1..i])
    back_i = the smallest such j (= longest piece wins ties)

then the chosen pieces reconstruct by walking ``back`` from len(word)
(again unrolled).  The same generator emits the DuckDB dialect, so both
engines execute literally the same arithmetic.

Exactness: piece costs are integer micro-nats
(``floor(1e6 * ln(total/cnt))`` — the BM25 idf convention: ln's
cross-engine last-ulp difference only matters exactly at the floor
boundary, the accepted residual); every best/back is then exact BIGINT
arithmetic, so segmentations — and the M-step counts — are
hash-identical across engines.

Words longer than ``L_MAX`` (none in this corpus; rare at web scale)
are excluded from training by contract — the documented alternative is
raising L_MAX, which grows the unrolled plan linearly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .text import tokens_expr

L_MAX = 12   # max word length the unrolled DP covers
P_MAX = 4    # max piece length
INF = 100_000_000_000_000  # > L_MAX * any real cost; sums stay in int64
VOCAB_K = 120  # top-K substrings kept (single chars always kept)
MICRO = 1_000_000


def dp_layers(dialect: str) -> list[list[str]]:
    """The unrolled Viterbi + reconstruction as LAYERS of SELECT
    expressions over columns ``word`` and a broadcast piece-cost map
    ``__pm``.  Every expression in a layer references only earlier
    layers (or siblings at depth <= 2), so Spark applies one chained
    ``selectExpr('*', ...)`` per layer — Catalyst collapses the Project
    chain, and the analyzer never sees a deep lateral-alias chain (a
    flat 100+-alias SELECT exhausts its resolution iterations).  The
    DuckDB oracle CAN take the flat form (its binder is iterative), so
    :func:`dp_select_exprs` flattens these same layers — every alias
    and arithmetic term is byte-identical across dialects, which is
    what makes the oracle exact; only the map lookup and array helpers
    differ."""
    if dialect == "spark":
        def lk(sub: str) -> str:
            return f"coalesce(try_element_at(__pm, {sub}), {INF})"
    elif dialect == "duckdb":
        def lk(sub: str) -> str:
            return f"coalesce(list_extract(__pm[{sub}], 1), {INF})"
    else:
        raise ValueError(dialect)

    layers: list[list[str]] = [["CAST(0 AS BIGINT) AS b0"]]
    for i in range(1, L_MAX + 1):
        js = list(range(max(0, i - P_MAX), i))
        layer = []
        for j in js:
            sub = f"substr(word, {j + 1}, {i - j})"
            layer.append(f"b{j} + {lk(sub)} AS c_{i}_{j}")
        cands = ", ".join(f"c_{i}_{j}" for j in js)
        best = f"least({cands})" if len(js) > 1 else cands
        layer.append(f"{best} AS b{i}")
        case = " ".join(f"WHEN c_{i}_{j} = b{i} THEN {j}" for j in js)
        layer.append(f"CASE {case} END AS k{i}")
        layers.append(layer)
    # the word's total Viterbi cost (= b at its length): the corpus
    # log-prob observable the EM-curve query aggregates (freq * wcost),
    # exact BIGINT like everything else in the DP
    bcase = " ".join(f"WHEN {i} THEN b{i}" for i in range(1, L_MAX + 1))
    layers.append([
        "length(word) AS p0",
        f"CASE length(word) {bcase} ELSE 0 END AS wcost",
    ])
    kcase = " ".join(f"WHEN {i} THEN k{i}" for i in range(1, L_MAX + 1))
    for s in range(1, L_MAX + 1):
        layers.append(
            [
                f"CASE p{s - 1} {kcase} ELSE 0 END AS q{s}",
                f"CASE WHEN p{s - 1} > 0 "
                f"THEN substr(word, q{s} + 1, p{s - 1} - q{s}) END AS t{s}",
                f"CASE WHEN p{s - 1} > 0 THEN q{s} ELSE 0 END AS p{s}",
            ]
        )
    ts = ", ".join(f"t{s}" for s in range(1, L_MAX + 1))
    if dialect == "spark":
        final = f"reverse(filter(array({ts}), x -> x IS NOT NULL)) AS pieces"
    else:
        final = (
            f"list_reverse(list_filter([{ts}], x -> x IS NOT NULL)) AS pieces"
        )
    layers.append([final])
    return layers


def dp_select_exprs(dialect: str) -> list[str]:
    """Flattened :func:`dp_layers` — the form the DuckDB oracle embeds."""
    return [e for layer in dp_layers(dialect) for e in layer]


def word_table(docs: DataFrame, col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale shuffle."""
    return (
        docs.select(F.explode(tokens_expr(col)).alias("word"))
        .filter(F.length("word") <= L_MAX)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def substring_vocab(words: DataFrame) -> DataFrame:
    """(piece, cnt, cost): every substring of length 1..P_MAX weighted by
    its word's frequency; keep the top ``VOCAB_K`` by (cnt DESC, piece)
    plus ALL single characters (so every word stays segmentable); cost
    in integer micro-nats against the kept total."""
    subs = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda s: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(P_MAX), F.length("word") - s + 1
                            ),
                        ),
                        lambda l: F.substring(F.col("word"), s, l),
                    ),
                )
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    # vocab-sized single-partition window — the BPE-merges precedent
    # (documented there): the pieces table is Heaps'-law bounded
    ranked = counts.withColumn(
        "__r",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("piece"))
        ),
    )
    kept = ranked.filter(
        (F.col("__r") <= VOCAB_K) | (F.length("piece") == 1)
    ).drop("__r")
    total = kept.agg(F.sum("cnt").alias("__total"))
    return kept.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        F.floor(
            F.lit(float(MICRO)) * F.log(F.col("__total") / F.col("cnt"))
        ).cast("long").alias("cost"),
    )


def viterbi_segment(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """(word, freq, pieces): best segmentation of each distinct word
    under the vocab costs (unrolled DP, see module doc)."""
    return _viterbi(words, vocab).select("word", "freq", "pieces")


def viterbi_segment_costed(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """:func:`viterbi_segment` plus ``wcost`` — the word's total
    segmentation cost in micro-nats (the EM objective's per-word term)."""
    return _viterbi(words, vocab).select("word", "freq", "pieces", "wcost")


def _collect_costs(vocab: DataFrame) -> list[tuple[str, int]]:
    """The (piece, cost) table on the driver — bounded by construction
    (top-``VOCAB_K`` substrings plus the single characters), the same
    bounded-collect class as the BPE per-round argmax.  r11: collecting
    the vocab once replaces the per-consumer ``vocab.agg(map_from_
    entries(...))`` subtree, whose aggregate re-ran the vocab lineage
    (and, before the words table was checkpointed, the corpus pass) for
    every Viterbi construction."""
    return [
        (r["piece"], r["cost"])
        for r in vocab.select("piece", "cost").collect()
    ]


def _viterbi(words: DataFrame, vocab: DataFrame) -> DataFrame:
    return _viterbi_entries(words, _collect_costs(vocab))


def _viterbi_entries(
    words: DataFrame, costs: list[tuple[str, int]]
) -> DataFrame:
    # the cost map rides in as a 1-row LOCAL relation (driver-built from
    # the collected vocab), broadcast-cross-joined exactly like the old
    # aggregated form: broadcasting a LocalTableScan launches no Spark
    # job, and keeping the map an ATTRIBUTE (not an inline literal)
    # stops CollapseProject from copying the ~200-entry map into each
    # of the ~40 DP lookups (the plan-canonicalization hazard measured
    # on the IVF centroid literals — see SCALE.md).
    from pyspark.sql.types import LongType, MapType, StringType, StructField, StructType

    pm = words.sparkSession.createDataFrame(
        [(dict(costs),)],
        StructType(
            [StructField("__pm", MapType(StringType(), LongType()), True)]
        ),
    )
    df = words.crossJoin(F.broadcast(pm))
    for layer in dp_layers("spark"):
        df = df.selectExpr("*", *layer)
    # cut the lineage: downstream operators over the (vocab-sized)
    # segmentation otherwise carry the unrolled DP's expression tree
    # into every later plan, and CollapseProject's re-inlining of the
    # shared b/k aliases blows the optimizer up (the same
    # canonicalization hazard the IVF centroid literals hit — see the
    # measured plan-size note in SCALE.md, "inlining n_cells × dim
    # centroid literals ... OOMs expression canonicalization").
    # 31-to-millions of distinct words is the
    # Heaps'-law-bounded side, so materializing it is O(vocab), never
    # O(corpus).
    return df.select("word", "freq", "pieces", "wcost").localCheckpoint(
        eager=False
    )


def unigram_piece_usage(docs: DataFrame, col: str = "text") -> DataFrame:
    """The E+M round: (piece, used_cnt) — corpus-weighted counts of the
    pieces the Viterbi segmentations actually chose.

    The word table is lazily checkpointed so the corpus pass runs ONCE:
    the bounded vocab collect materializes it, and the returned frame's
    Viterbi reuses the materialized partitions instead of re-running
    the corpus aggregate."""
    words = word_table(docs, col).localCheckpoint(eager=False)
    seg = viterbi_segment(words, substring_vocab(words))
    return (
        seg.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("used_cnt"))
    )


def unigram_encode(docs: DataFrame, col: str = "text") -> DataFrame:
    """The APPLY step (BPE-encode symmetry): tokenize every document
    under the learned segmentation — ``(doc id cols..., n_words,
    n_pieces, n_chars_encoded)``.  ONE corpus-scale join: the corpus's
    exploded words equi-join the broadcast (vocab-sized) word->pieces
    table; per-word piece counts then aggregate back per document.
    Words beyond L_MAX pass through unsegmented (counted as one piece —
    the <unk> convention), so every word is accounted for."""
    words = word_table(docs, col).localCheckpoint(eager=False)
    seg = viterbi_segment(words, substring_vocab(words)).select(
        "word", F.size("pieces").alias("__np")
    )
    id_cols = [c for c in docs.columns if c != col]
    exploded = docs.select(
        *id_cols, F.explode(tokens_expr(col)).alias("word")
    )
    return (
        exploded.join(F.broadcast(seg), "word", "left")
        .groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.coalesce(F.col("__np"), F.lit(1))).alias("n_pieces"),
            F.sum(F.length("word")).alias("n_chars_encoded"),
        )
    )


def reestimated_vocab(init_vocab: DataFrame, usage: DataFrame) -> DataFrame:
    """The M-step's new cost table: pieces re-weighted by what the
    round-0 Viterbi actually USED.  Unused single characters survive at
    count 1 (add-one smoothing) so every word stays segmentable; unused
    multi-char pieces drop out — the unigram prune.  Same integer
    micro-nat cost formula as the init vocab.

    r11: both inputs are vocab-bounded (pieces ⊆ the top-``VOCAB_K`` +
    single-char vocab), so the M-step runs on the DRIVER: collect,
    smooth in exact Python integers, and re-cost over a local relation
    — the ``ln`` stays a JVM expression (Catalyst folds the local
    projection at plan time), so the costs are bit-identical to the
    old distributed aggregate's, with zero shuffle and zero broadcast
    per EM round."""
    spark = init_vocab.sparkSession
    chars = [
        r["piece"]
        for r in init_vocab.filter(F.length("piece") == 1)
        .select("piece")
        .collect()
    ]
    used = [
        (r["piece"], r["used_cnt"])
        for r in usage.select("piece", "used_cnt").collect()
    ]
    return _reestimated_vocab_local(spark, chars, used)


def _reestimated_vocab_local(
    spark, chars: list[str], used: list[tuple[str, int]]
) -> DataFrame:
    """Driver-side M-step arithmetic over collected counts (see
    :func:`reestimated_vocab`).  Counts and the total are exact Python
    ints; the micro-nat cost keeps the exact expression shape of the
    init vocab (``floor(1e6 * ln(total / cnt))`` with a long/long
    divide) so the JVM arithmetic is unchanged."""
    seen = {p for p, _ in used}
    smoothed = [(p, int(c)) for p, c in used] + [
        (c, 1) for c in chars if c not in seen
    ]
    total = sum(c for _, c in smoothed)
    base = spark.createDataFrame(smoothed, "piece string, cnt long")
    return base.select(
        "piece",
        "cnt",
        F.floor(
            F.lit(float(MICRO))
            * F.log(F.lit(total).cast("long") / F.col("cnt"))
        ).cast("long").alias("cost"),
    )


def _usage_of(seg: DataFrame) -> DataFrame:
    return (
        seg.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("used_cnt"))
    )


def unigram_em_curve(
    docs: DataFrame, col: str = "text", rounds: int = 3
) -> DataFrame:
    """Hard-EM iterated to ``rounds`` re-estimations, reporting the
    training curve AS DATA: one row per round ``(round, vocab_size,
    corpus_cost_micro)`` where ``corpus_cost_micro = Σ_words freq ·
    wcost`` — the corpus negative log-likelihood under that round's
    model, in exact integer micro-nats.

    Convergence story (test-pinned on the fixture corpora): the curve
    is NON-INCREASING and reaches a fixed point — Viterbi under costs
    θ_t can only lower the objective for fixed θ_t, the M-step's
    re-estimated costs are the (add-one-smoothed, floored) MLE of the
    chosen pieces, and once segmentations stop changing the usage —
    hence the cost table, hence the objective — is EXACTLY stationary.
    The floor/smoothing approximations can in principle cost a few
    micro-nats near the fixed point; the unit test pins monotonicity in
    micro-nats on the fixtures, where the EM gains dwarf them.

    Distribution shape: corpus-scale work stays the ONE word-frequency
    shuffle; each round is one more unrolled-Viterbi pass over the
    Heaps'-law-bounded distinct-word table with the (vocab-sized) cost
    map broadcast — K rounds cost K vocab-table passes, never K corpus
    scans.

    r11 job accounting: the vocab/cost tables are vocab-bounded, so
    they live on the driver between rounds — one bounded collect of the
    init vocab (which also materializes the words checkpoint), then per
    round ONE bounded usage collect and a driver-local re-cost, instead
    of the old per-round cost-map aggregate + broadcast, vocab-size
    aggregate + broadcast, and M-step shuffle (profiled at 46 Spark
    jobs for the 4-round curve; the corpus/word-table data path is
    unchanged)."""
    spark = docs.sparkSession
    words = word_table(docs, col).localCheckpoint(eager=False)
    costs = _collect_costs(substring_vocab(words))
    chars = [p for p, _ in costs if len(p) == 1]
    stats = []
    for r in range(rounds + 1):
        seg = _viterbi_entries(words, costs)
        stats.append(
            seg.agg(
                F.sum(F.col("freq") * F.col("wcost"))
                .cast("long")
                .alias("corpus_cost_micro")
            )
            .select(
                F.lit(r).cast("int").alias("round"),
                F.lit(len(costs)).cast("long").alias("vocab_size"),
                "corpus_cost_micro",
            )
        )
        if r < rounds:
            used = [
                (u["piece"], u["used_cnt"])
                for u in _usage_of(seg).collect()
            ]
            costs = _collect_costs(
                _reestimated_vocab_local(spark, chars, used)
            )
    return reduce(lambda a, b: a.unionByName(b), stats)


def unigram_piece_usage_em(docs: DataFrame, col: str = "text") -> DataFrame:
    """One FULL hard-EM round: init vocab -> Viterbi -> usage counts
    (E+M) -> re-estimated costs -> second Viterbi -> final usage counts.
    Both Viterbi passes run the same unrolled DP on the vocab-sized
    word table; corpus-scale work stays the single word-frequency
    shuffle (checkpointed, so it runs once across both passes); the
    M-step between them is the driver-local re-cost over one bounded
    usage collect (see :func:`reestimated_vocab`)."""
    spark = docs.sparkSession
    words = word_table(docs, col).localCheckpoint(eager=False)
    init_costs = _collect_costs(substring_vocab(words))
    seg0 = _viterbi_entries(words, init_costs)
    used0 = [
        (r["piece"], r["used_cnt"]) for r in _usage_of(seg0).collect()
    ]
    chars = [p for p, _ in init_costs if len(p) == 1]
    seg1 = _viterbi_entries(
        words,
        _collect_costs(_reestimated_vocab_local(spark, chars, used0)),
    )
    return (
        seg1.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("used_cnt"))
    )
