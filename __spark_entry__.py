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
    graph,
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
]

# The driver's correctness gate checks only the FIRST ~50 queries() entries
# in iteration order, so the window below is rotated each round until every
# family has driver-level hard signal (COVERAGE.json tracks the cumulative
# map; round 1 verified relational/TPC-H, round 2 dedup/similarity/
# multimodal/text). Round-3 window, per VERDICT r2's ranked list:
#   - the 2 array-output queries fixed this round (flattened shapes) — kept
#     in-window to prove the fix against the real driver canonicalizer;
#   - 1 driver-green relational canary (q01) to catch regressions, plus ALL
#     SIX r1 hash-fail queries (dq_constraint_audit, lineitem_sequence_audit,
#     scalar_functions, filter_patterns, q12_late_shipments, order_backlog —
#     fixed in r2, but only mirror-verified): the known driver-level failure
#     class gets re-proved before anything else;
#   - the never-driver-verified families: decontaminate, graph, timeseries
#     (incl. the DATE-defused events_seasonal_anomaly), rollup (incl. the
#     DATE-defused events_incremental_rollup), temporal, skew, and the head
#     of events (incl. the flattened events_approx_sketches).
# Still queued for rounds 4+: rest of events, sampling (incl. the six new
# curation queries), analytics, agentdemo (see COVERAGE.json;
# complex_types turned out to be already driver-green from round 1, so it
# stays in the tail).
_R3_WINDOW = [
    # fixed-shape proofs (errored in CORRECTNESS_r02, flattened this round)
    "media_features",
    "text_inverted_index",
    # relational canary (driver-green in r1)
    "q01_pricing_summary",
    # the six r1 hash-fails, fixed in r2 — driver-level proof of the fixes
    "dq_constraint_audit",
    "lineitem_sequence_audit",
    "scalar_functions",
    "filter_patterns",
    "q12_late_shipments",
    "order_backlog",
    # decontaminate (7)
    "text_decontaminate",
    "text_contamination_spans",
    "text_ngram_novelty",
    "corpus_snapshot_diff",
    "corpus_drift_psi",
    "dedup_repeated_spans",
    "pipeline_corpus_funnel",
    # graph (6)
    "graph_bfs_hops",
    "dedup_connected_components",
    "graph_pagerank",
    "graph_triangle_count",
    "graph_label_propagation",
    "graph_kcore",
    # timeseries (7)
    "events_sax_similarity",
    "events_cusum_shift",
    "events_seasonal_anomaly",
    "events_forecast_holt",
    "events_forecast_holt_winters",
    "events_forecast_backtest",
    "events_trend_robust",
    # rollup (2)
    "events_incremental_rollup",
    "orders_join_ivm",
    # temporal (3)
    "events_asof_join",
    "events_range_join",
    "events_funnel",
    # skew (2)
    "skew_salted_distinct",
    "skew_salted_join",
    # head of events (14, incl. the flattened sketch query) — complex_types
    # is NOT here: COVERAGE.json shows all 7 entries driver-green in r1
    "events_approx_sketches",
    "events_hypertable_rollup",
    "events_session_window_native",
    "window_range_frame",
    "events_countmin_heavyhitters",
    "events_attribution_multitouch",
    "events_hll_report",
    "events_kmv_set_ops",
    "events_quantile_sketch_report",
    "events_hll_incremental",
    "events_ab_test_ztest",
    "events_user_lifecycle",
    "events_weekly_load_profile",
    "events_dwell_percentiles",
]

# Stable alias for tools (tools/make_coverage.py): the per-round list above
# is renamed each rotation; this name is not.
DRIVER_WINDOW = _R3_WINDOW


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3 shipping priority
    (3-way join + agg + deterministic top-k)."""
    return relational.q03_shipping_priority(spark, "/root/testdata/sf0.001")


def _ordered(full: dict) -> dict:
    """Window names first (in window order), then the rest in module order."""
    missing = [name for name in _R3_WINDOW if name not in full]
    # a typo in the window list must fail loudly, not silently shrink the
    # driver's 50-slot verification window
    assert not missing, f"window names not in queries(): {missing}"
    out = {name: full[name] for name in _R3_WINDOW}
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
