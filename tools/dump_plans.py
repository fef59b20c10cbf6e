"""Regenerate PLANS.md: formatted physical plans of representative queries,
the evidence that pushdown/broadcast/top-k/partial-agg hold.

Usage: python tools/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_postgres_etl_spark.plans import QUERIES  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402

SHOWCASE = {
    "tpch_q6_revenue_forecast": "full predicate pushdown + column pruning at the scan",
    "tpch_q5_revenue_by_nation": "all dims broadcast; fact table never shuffles for joins",
    "q2_top_event_types": "distributed top-k (TakeOrderedAndProject, no global sort)",
    "tpch_q1_pricing_summary": "map-side partial aggregation before the exchange",
    "dedup_lsh_pairs": "LSH candidate generation as an equi-join (no all-pairs)",
    "q_asof_join": "as-of join as one partitioned sort (union+window)",
    "multimodal_features": "Arrow-batched MapInPandas (the sanctioned Python path)",
    "dedup_simhash_near": "hamming-radius search as a pigeonhole block equi-join",
    "sim_knn_ivf_mp": "IVF ANN: broadcast centroid assignment + cell equi-join",
    "tpch_q21_waiting_supplier": "EXISTS + NOT EXISTS as semi + anti joins",
    "q_rollup_cascade": "continuous-aggregate cascade over cached levels",
    "tpch_q8_market_share": "8-relation star join: every dim broadcast",
    "tpch_q2_min_cost_supplier": "min-cost-per-part as rank after broadcasts",
    "q_stratified_sample": "deterministic sample as a narrow codegen'd filter",
    "text_repetition": "bigram repetition signals fully JVM-side",
    "dedup_lsh_pairs_capped": "hot-band cap as a broadcast anti-join (no second shuffle)",
    "dedup_lsh_band_stats": "occupancy diagnostics: two partial+final hash aggregates",
    "text_pii_flags": "PII regexp counting fully JVM-side (no Python)",
    "pipeline_decontaminate_hits": (
        "benchmark 13-grams broadcast; the training side joins with no shuffle"
    ),
    "pipeline_pack_sequences": (
        "distributed prefix sum: per-block window cumsum + broadcast block offsets"
    ),
    "q_temperature_mixing": "per-source keep rates broadcast onto an unshuffled corpus",
    "pipeline_bpe_merges": (
        "BPE merge learning: one corpus scan, cached-vocab iterations, top-1 argmax"
    ),
    "pipeline_training_corpus": (
        "composed quality/decontaminate/mix/pack: every corpus join broadcast"
    ),
    "multimodal_video_frames": (
        "random-access frame sampling: narrow mapInPandas, no shuffle before the sort"
    ),
    "q_gap_fill_hourly": (
        "gap fill + LOCF: per-day windows + broadcast carry, no global funnel"
    ),
    "q_funnel": "ordered conversion from ONE hash aggregate (no self-joins)",
    "pipeline_chunk_documents": (
        "context-window chunking: map-only tokenize/sequence/slice/explode"
    ),
    "sim_knn_ivf_sq8": (
        "IVF-SQ8: int8 codes built in codegen, centroids broadcast, cell equi-join"
    ),
    "q_time_range_window": "value-RANGE frame: one keyed window, no global sort",
    "q_weighted_sample": "weighted sampling as a shuffle-free distributed top-k",
    "q_grouping_sets": "arbitrary grouping sets: one Expand + one aggregate pair",
    "text_bm25_topk": (
        "BM25 one-scan formulation: dl + pivoted per-term tfs in a single"
        " checkpointed aggregate; totals broadcast; TakeOrderedAndProject"
    ),
    "scd2_point_in_time": (
        "PIT fact join: SCD2 history broadcast with an interval residual"
    ),
    "dq_quarantine_split": (
        "map-side quarantine split: one shared projection, zero Exchange"
    ),
    "dedup_span_coverage": (
        "duplicated-span signal: span hash-agg + linear join back, no pairwise stage"
    ),
    "pipeline_token_budget_select": (
        "budget prefix: per-row window partitioned by priority; the only "
        "single-partition exchange feeds the per-priority aggregate"
    ),
    "dedup_span_removal": (
        "exact-substring removal: positional span hash-agg + linear join "
        "back, per-doc rebuild — no pairwise stage, no suffix array"
    ),
    "text_source_classifier": (
        "NB classifier: model grid broadcast, all-class scoring fan-out "
        "collapsed map-side before the (doc x class) shuffle"
    ),
    "q_anomaly_hours": (
        "anomaly flags: keyed RANGE window over post-aggregate hour rows, "
        "all-integer z-test"
    ),
    "sim_knn_ivf_pq": (
        "IVF-PQ: codes + broadcast ADC tables; candidate scan never touches "
        "float vectors"
    ),
    "multimodal_image_near_dup": (
        "image near-dup: mapInPandas decode + aHash, then the shared "
        "SimHash pigeonhole block equi-join — no cartesian"
    ),
    "cluster_kmeans": (
        "k-means final assignment: k-row centroids broadcast, map-side "
        "integer argmin — the corpus never shuffles"
    ),
    "text_hybrid_rrf": (
        "hybrid RRF fusion: two truncated top-L rank lists collapsed by "
        "ONE hash aggregate — no join, no sort-merge anywhere"
    ),
    "pipeline_cluster_prototypes": (
        "cluster-balanced selection: per-cluster top-k window above the "
        "broadcast assignment, never a global sort"
    ),
    "er_fuzzy_match": (
        "blocked ER: candidate generation is an equi-join on the blocking"
        " key; Levenshtein comparator stays inside codegen"
    ),
    "graph_triangles": (
        "degree-oriented triangle counting: wedge fan-out bounded by"
        " orientation, closure is an equi-join"
    ),
    "graph_hierarchy_closure": (
        "recursive-CTE parity: pointer-doubling closure, log(depth)"
        " node-sized self-joins"
    ),
    "q_market_basket": (
        "basket self-join fan-out bounded by basket size; lift"
        " denominators broadcast onto the top-k"
    ),
    "q_interpolate_linear": (
        "linear interpolation via frame windows PARTITIONED BY the"
        " series key (no global window)"
    ),
    "q_attribution": (
        "last-touch attribution: one per-user IGNORE NULLS window, no"
        " event-stream self-join"
    ),
    "q_chi_square": (
        "chi-square cells: one fact aggregate, category-sized totals"
        " broadcast back"
    ),
    "q_time_weighted_avg": (
        "LOCF time-weight rollup: the aggregate reuses the lead window's"
        " hash(user_id) exchange — one data shuffle total"
    ),
    "q_event_transitions": (
        "Markov transitions: one corpus-sized hash(user_id) exchange for"
        " the lag window; pair counting partial-aggregates map-side, so"
        " later exchanges move only the alphabet-squared frame"
    ),
    "q_ab_test": (
        "A/B moments: ONE map-side-combinable hash aggregate over the"
        " filtered fact, two reduce groups"
    ),
    "q_geo_radius_join": (
        "grid-bucketed radius join: cell equi-join + 3x3 neighbor"
        " explode on the 100x-smaller side; no cartesian product"
    ),
    "text_strip_markup": (
        "HTML stripping: a single narrow regexp_replace chain in"
        " whole-stage codegen, zero Exchange"
    ),
    "pipeline_unigram_tokenize": (
        "unigram tokenizer: ONE corpus word-frequency shuffle; the"
        " unrolled Viterbi runs on the Heaps'-bounded vocab with piece"
        " costs broadcast as a map literal"
    ),
    "pipeline_unigram_em_curve": (
        "hard-EM to a fixed point: K+1 Viterbi passes over the"
        " checkpointed vocab-sized word table, corpus cost as exact"
        " integer micro-nats — corpus work never repeats"
    ),
    "pipeline_line_dedup": (
        "line dedup with the size-gated dictionary join: heavy set"
        " materialized once (count + join share it), broadcast below"
        " the threshold, sort-merge above — never an unbounded"
        " corpus-derived broadcast"
    ),
    "pipeline_dsir_select": (
        "DSIR selection: two bucket-bounded corpus aggregates, the"
        " 512-row log-ratio table BROADCAST into per-doc counts, the"
        " k-selection as TakeOrdered — pool read twice, target once,"
        " nothing quadratic"
    ),
}

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="dump_plans", shuffle_partitions=8)
    out = [
        "# PLANS — physical-plan evidence (generated by tools/dump_plans.py)",
        "",
        "Formatted `explain` output at sf0.001 for the queries that showcase",
        "each physical property. Regenerate after plan-affecting changes.",
        "",
    ]
    MAX_PLAN_LINES = 220  # the evidence is in the head (tree + first nodes);
    # deeply unrolled iterative plans (BPE's 6 chained argmax/merge rounds
    # reprint the cached vocab relation at every reference) would otherwise
    # add thousands of redundant lines per entry.
    for name, why in SHOWCASE.items():
        df = QUERIES[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines = plan.rstrip().splitlines()
        if len(lines) > MAX_PLAN_LINES:
            lines = lines[:MAX_PLAN_LINES] + [
                f"... [truncated: {len(plan.rstrip().splitlines())} total lines]"
            ]
        out += [f"## {name}", "", f"*{why}*", "", "```", "\n".join(lines), "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
