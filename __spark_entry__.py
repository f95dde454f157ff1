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
# map; round 1 verified relational/TPC-H + complex_types, round 2 dedup/
# similarity/multimodal/text, round 3 decontaminate/graph/timeseries/
# rollup/temporal/skew/events-head — 141/217 cumulative green after r3).
# Round-4 window, per VERDICT r3's ranked list: 1 canary (q01) + 49
# first-time queries —
#   - all 24 sampling queries (incl. the three new mixture/curriculum
#     planners, the newest float-discipline code → highest residual risk);
#   - the four new ANN queries, graph_modularity/graph_degree_powerlaw,
#     curation (2), rollup tail (events_histogram_incremental);
#   - analytics' never-verified 11;
#   - dedup_savings, decontam_ngram_sweep, and the three riskiest events
#     remainders (variant/json extraction + epoch projections).
# Still queued for round 5 (27): rest of events (13), text tail (9),
# agentdemo (5) — all strict-mirror-verified today (see COVERAGE.json).
_R4_WINDOW = [
    # relational canary (driver-green r1, re-proved r3)
    "q01_pricing_summary",
    # sampling (24) — mixture/curriculum trio leads: newest float recipes
    "mixture_doremi_step",
    "mixture_token_budget",
    "curriculum_quality_bins",
    "sample_weighted_reservoir",
    "sample_shuffle_shard",
    "sample_importance_weighted",
    "sample_source_mixture",
    "sample_temperature_mixture",
    "sample_hash_split",
    "sample_split_balance",
    "sample_stratified_cap",
    "sample_bootstrap_ci",
    "anomaly_mad",
    "anomaly_zscore",
    "histogram_equidepth",
    "histogram_totalprice",
    "layout_zorder_stats",
    "unpivot_measures",
    "gapfill_locf",
    "events_ewma_daily",
    "time_weighted_avg",
    "winsorized_stats",
    "training_manifest",
    "sql_interface",
    # similarity: the four new ANN queries (r3 additions, mirror-only)
    "ann_ivf_multiprobe",
    "ann_nprobe_recall",
    "ann_ivf_health",
    "embedding_dim_audit",
    # graph tail (2)
    "graph_modularity",
    "graph_degree_powerlaw",
    # curation (2)
    "pipeline_corpus_build",
    "corpus_datasheet",
    # rollup tail (1)
    "events_histogram_incremental",
    # analytics — never-verified 11
    "pareto_revenue_concentration",
    "revenue_seasonality",
    "cohort_ltv",
    "part_supplier_hhi",
    "basket_part_pairs_lift",
    "customer_rfm",
    "stats_regression_by_brand",
    "events_gaps_islands",
    "events_retention_cohort",
    "window_rank_variants",
    "dedup_levenshtein",
    # dedup/decontaminate tails (2)
    "dedup_savings",
    "decontam_ngram_sweep",
    # events remainder that fits (3): the riskiest extraction shapes
    "events_json_extract",
    "events_variant_extract",
    "epoch_projections",
]

# Stable alias for tools (tools/make_coverage.py): the per-round list above
# is renamed each rotation; this name is not.
DRIVER_WINDOW = _R4_WINDOW


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3 shipping priority
    (3-way join + agg + deterministic top-k)."""
    return relational.q03_shipping_priority(spark, "/root/testdata/sf0.001")


def _ordered(full: dict) -> dict:
    """Window names first (in window order), then the rest in module order."""
    missing = [name for name in _R4_WINDOW if name not in full]
    if missing:
        # a typo in the window list must fail loudly, not silently shrink
        # the driver's 50-slot verification window (and must survive -O,
        # so no assert)
        raise ValueError(f"window names not in queries(): {missing}")
    out = {name: full[name] for name in _R4_WINDOW}
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
