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
# map; rounds 1-5 verified 239/250 distinct queries — see COVERAGE.json
# rounds_seen for the per-round map).
# Round-6 window, per VERDICT r5's orders: lead with the FINAL 11 queries
# that have never been inside a driver window (all mirror-green; a green
# row for each closes the verification debt at 250/250 cumulative), then
# fill the 39 re-proof slots with, in priority order:
#  - the canary (q01),
#  - queries whose OUTPUT COLUMNS were touched by the round-5 BIGINT-cast
#    sweep (commit a645da5, the retired 41-query int32-dtype list) or the
#    ANSI fixes (42227c9) and whose last green round predates that sweep —
#    their driver hashes were earned on the old int32 bodies,
#  - this round's review fixes that changed output VALUES (l-diversity,
#    generalization ladder, er_blocking_plan) or quantized output
#    arithmetic (attribution, kmeans_step, embedding_norms) — swapped in
#    over slots whose bodies were unchanged since their greens (q03,
#    dedup_exact, pipeline_corpus_build/funnel, the two keep_last
#    streaming anchors),
#  - the connected-components family re-proofs (dedup_canonical_corpus
#    switched to star CC, dedup_connected_components documented against
#    the fail-loud exhaustion semantics).
_R6_WINDOW = [
    # the 11 never-driver-verified (mirror-green since r5)
    "text_repetition_gates",
    "split_leakage_audit",
    "events_ooo_depth",
    "ingest_text_files",
    "kafka_envelope",
    "privacy_tcloseness",
    "governance_license_taint",
    "dq_schema_drift",
    "dp_contribution_bounds",
    "er_match_pairs",
    "er_golden_record",
    # canary
    "q01_pricing_summary",
    # round-6 review fixes that changed output values of green-r5 queries
    # (each swapped in over a lower-value re-proof slot: the flagship q03
    # is smoke-checked by entry() every round with an unchanged body;
    # dedup_exact and pipeline_corpus_build bodies are unchanged since
    # their greens): l-diversity got a non-degenerate sensitive attribute,
    # the ladder's pct_rows joined the module's 0-100 convention, and
    # er_blocking_plan's reduction_ratio now follows the standard
    # 1-minus-retained convention. (privacy_kanonymity's body was also
    # touched — shared _K_ANON constant — but its output values are
    # provably identical, so its r5 green still attests it.)
    "privacy_ldiversity",
    "privacy_generalization_ladder",
    # BIGINT-cast sweep re-proofs: TPC-H + relational (green r1, body
    # changed r5)
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "supplier_leadtime",
    "window_topk_per_group",
    "array_ops",
    "text_udtf_words",
    # BIGINT-cast sweep re-proofs: ANN/similarity (green r2)
    "ann_filtered_topk",
    "ann_hard_negatives",
    "ann_lsh_bucketed",
    "ann_pq_adc",
    "ann_cosine_topk",
    "ann_recall_report",
    "embeddings_power_iteration",
    # BIGINT-cast sweep re-proofs: text (green r2)
    "text_repetition_metrics",
    "text_chunking",
    "text_redact_pii",
    "text_token_stats",
    # BIGINT-cast sweep re-proofs: analytics/sampling/events (green r3/r4)
    "cohort_ltv",
    "revenue_seasonality",
    "text_decontaminate",
    "dedup_levenshtein",
    "events_histogram_incremental",
    "histogram_equidepth",
    "layout_zorder_stats",
    "sample_shuffle_shard",
    "sample_weighted_reservoir",
    "window_rank_variants",
    # ANSI-fix re-proofs (42227c9)
    "mixture_token_budget",
    "sample_split_balance",
    # round-6 review fix (reduction_ratio convention)
    "er_blocking_plan",
    # round-6 float-determinism fixes that quantized output arithmetic
    # (integer/decimal sums replacing order-sensitive double AVG/SUM) —
    # values are expected unchanged at fixture scale but the driver hash
    # should re-attest them; each took the slot of a query whose body is
    # unchanged since its green (debounce_keep_last, dedup_keep_latest,
    # pipeline_corpus_funnel). The remaining round-6-touched queries
    # (tumbling/hypertable decimal sums, session ms-truncation, the
    # dedup cluster-hash family) are covered by the HEAD mirror gate and
    # retain their prior greens.
    "events_attribution_multitouch",
    "ann_kmeans_step",
    "embedding_norms",
    # CC-family re-proofs (bodies touched this round)
    "dedup_canonical_corpus",
    "dedup_connected_components",
]

# Stable alias for tools (tools/make_coverage.py): the per-round list above
# is renamed each rotation; this name is not.
DRIVER_WINDOW = _R6_WINDOW


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3 shipping priority
    (3-way join + agg + deterministic top-k)."""
    return relational.q03_shipping_priority(spark, "/root/testdata/sf0.001")


def _ordered(full: dict) -> dict:
    """Window names first (in window order), then the rest in module order."""
    missing = [name for name in _R6_WINDOW if name not in full]
    if missing:
        # a typo in the window list must fail loudly, not silently shrink
        # the driver's 50-slot verification window (and must survive -O,
        # so no assert)
        raise ValueError(f"window names not in queries(): {missing}")
    out = {name: full[name] for name in _R6_WINDOW}
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
