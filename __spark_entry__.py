"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` aggregates the engine's operator inventory (SURVEY.md §2);
each entry has a matching ANSI-SQL oracle in ``oracle_sql()`` unless the
operator is genuinely non-SQL-expressible (zip explode, gzip, envelope
bytes) — those run against frozen golden parquet or as rows-only checks
and carry byte-level goldens in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from log_agent_spark.operators import (
    curation,
    decontaminate,
    dedup,
    governance,
    graph,
    linkage,
    multimodal,
    rollup,
    similarity,
    skew,
    temporal,
    text,
    timeseries,
)
from log_agent_spark.plans import (
    agentdemo,
    analytics,
    complex_types,
    events,
    relational,
    sampling,
    tpch_extra,
    tpch_partsupp,
)

_MODULES = [
    dedup, similarity, multimodal, text, decontaminate, curation, graph,
    timeseries, events, sampling, temporal, skew, rollup, analytics,
    complex_types, agentdemo, tpch_extra, tpch_partsupp, relational,
    governance, linkage,
]

# The driver's correctness gate checks only the FIRST ~50 queries() entries
# in iteration order, so the window below is rotated each round until every
# family has driver-level hard signal (COVERAGE.json tracks the cumulative
# map; rounds 1-6 verified all 250 distinct queries at least once).
# Round-8 window, per VERDICT r7's orders (items 1/4/5):
#  - the canary (q01),
#  - this round's 8 value-stable-but-body-changed queries: the shared
#    capped_basket_items hub valve rewrote the 7 basket-pair consumers'
#    bodies AND their oracles (cap 512 >> TPC-H max basket 7, so sf0.01
#    values are unchanged — re-proven by the driver here), and the
#    attribution valve rewrote events_attribution_multitouch (cap 32 > 5x
#    the honest 6 clicks/user/day, values unchanged likewise),
#  - oldest-first second-signal fill (after r7, 165 queries hold exactly
#    one lifetime driver signal): the 7 remaining round-1 singles and ALL
#    33 round-2 singles; the last slot goes to this round's net-new
#    skew_pairgen_radar, and the r3+ singles rotate in from r9 onward.
_R8_WINDOW = [
    # canary
    "q01_pricing_summary",
    # r8 body-changed: shared basket hub valve (VERDICT r7 item 1)
    "graph_triangle_count",
    "graph_label_propagation",
    "graph_kcore",
    "graph_modularity",
    "graph_degree_powerlaw",
    "graph_jaccard_neighbors",
    "basket_part_pairs_lift",
    # r8 body-changed: per-(user, day) click cap (VERDICT r7 item 4)
    "events_attribution_multitouch",
    # round-1 singles (oldest single-signal queries)
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    "recursive_tree_rollup",
    "set_ops",
    "subquery_above_avg",
    "window_lag_gap",
    "window_running_sum",
    # round-2 singles, alphabetical fill
    "ann_int8_topk",
    "ann_ivf",
    "ann_matryoshka_recall",
    "dedup_bloom_prefilter",
    "dedup_containment",
    # r8 body-changed late addition: the stop-shingle DF valve rewrote
    # dedup_ngram_jaccard's body + oracle (values unchanged — fixture max
    # shingle df 199 < cap 512); text_zipf_fit carries to r9 for it
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_group_split",
    "dedup_incremental",
    "dedup_lsh_quality",
    "dedup_minhash_estimate",
    "dedup_minhash_incremental",
    "dedup_minhash_lsh",
    "dedup_semantic_clustered",
    "dedup_simhash",
    "dedup_soft_weights",
    "dedup_source_overlap",
    "dedup_split_leakage",
    "media_aspect_buckets",
    "media_decode_meta",
    "media_frame_sample",
    "media_kind_stats",
    "media_shard_manifest",
    "text_bigram_logprob",
    "text_bm25_search",
    "text_bpe_merge_step",
    "text_langid_confusion",
    "text_pack_sequences",
    "text_perplexity_filter",
    "text_quality_classifier",
    "text_unigram_logprob",
    "text_vocab_growth",
    # the round-8 net-new operator takes the last slot so it earns driver
    # signal in its introduction round (the r6-newly-green precedent);
    # corpus_drift_psi (the oldest r3 single) rotates in at r9
    "skew_pairgen_radar",
]

# Stable alias for tools (tools/make_coverage.py): the per-round list above
# is renamed each rotation; this name is not.
DRIVER_WINDOW = _R8_WINDOW


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3 shipping priority
    (3-way join + agg + deterministic top-k)."""
    return relational.q03_shipping_priority(spark, "/root/testdata/sf0.001")


def _ordered(full: dict) -> dict:
    """Window names first (in window order), then the rest in module order."""
    missing = [name for name in _R8_WINDOW if name not in full]
    if missing:
        # a typo in the window list must fail loudly, not silently shrink
        # the driver's 50-slot verification window (and must survive -O,
        # so no assert)
        raise ValueError(f"window names not in queries(): {missing}")
    out = {name: full[name] for name in _R8_WINDOW}
    out.update((k, v) for k, v in full.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    full: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        full.update(mod.QUERIES)
    return _ordered(full)


def oracle_sql() -> dict[str, str]:
    full: dict[str, str] = {}
    for mod in _MODULES:
        full.update(mod.ORACLES)
    return _ordered(full)
