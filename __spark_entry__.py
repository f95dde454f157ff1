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
# Round-7 window, per VERDICT r6's orders — SECOND-signal re-proofs (after
# r6, 211 queries hold exactly one lifetime driver signal; the r6 zero-drift
# audit proved their outputs bit-identical since their greens, so ~32
# re-proof slots per round rotate oldest-first until every query holds >= 2):
#  - the canary (q01),
#  - the 4 round-6 value-changed queries (each has exactly one driver
#    signal on its NEW body, earned in r06),
#  - the round-6 newly-green queries (one lifetime signal each; 10 listed —
#    events_ooo_depth, the 11th, sits in the value-changed group above),
#  - the two DateType-output queries (cast to ISO strings since r3; the one
#    dtype class with a logged mirror divergence, driver-proven once in r3),
#  - this round's ADVICE-touched bodies (ngram-jaccard gate-from-argument,
#    anomaly_mad NULL-rank fix, kmv_set_ops range(1) seed, bsi_parse
#    index clamp behind ingest_logfile_tree),
#  - oldest-first fill from the round-1 single-signal set (the remaining
#    r1 singles — q21/q22, recursive_tree_rollup, set_ops,
#    subquery_above_avg, window_lag_gap, window_running_sum — plus the r2+
#    singles carry the dated reason above until their rotation round).
_R7_WINDOW = [
    # canary
    "q01_pricing_summary",
    # r6 value-changed bodies: second signal on the new values
    "privacy_ldiversity",
    "privacy_generalization_ladder",
    "er_blocking_plan",
    "events_ooo_depth",
    # r6 newly-green: second signal
    "text_repetition_gates",
    "split_leakage_audit",
    "ingest_text_files",
    "kafka_envelope",
    "privacy_tcloseness",
    "governance_license_taint",
    "dq_schema_drift",
    "dp_contribution_bounds",
    "er_match_pairs",
    "er_golden_record",
    # DateType-output families (day cast to ISO string on both engines)
    "events_seasonal_anomaly",
    "events_incremental_rollup",
    # round-7 ADVICE-touched bodies
    "dedup_ngram_jaccard",
    "anomaly_mad",
    "events_kmv_set_ops",
    "ingest_logfile_tree",
    # oldest-first second-signal fill: round-1 singles
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_rollup",
    "events_top_movers",
    "filter_oversize",
    "join_anti",
    "join_broadcast",
    "join_full_outer",
    "join_semi",
    "lateral_explode",
    "nation_share_of_region",
    "pandas_udaf_geomean",
    "q02_min_cost_supplier",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q18_large_volume",
    "q19_banded_revenue",
    "q20_promotion_suppliers",
]

# Stable alias for tools (tools/make_coverage.py): the per-round list above
# is renamed each rotation; this name is not.
DRIVER_WINDOW = _R7_WINDOW


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3 shipping priority
    (3-way join + agg + deterministic top-k)."""
    return relational.q03_shipping_priority(spark, "/root/testdata/sf0.001")


def _ordered(full: dict) -> dict:
    """Window names first (in window order), then the rest in module order."""
    missing = [name for name in _R7_WINDOW if name not in full]
    if missing:
        # a typo in the window list must fail loudly, not silently shrink
        # the driver's 50-slot verification window (and must survive -O,
        # so no assert)
        raise ValueError(f"window names not in queries(): {missing}")
    out = {name: full[name] for name in _R7_WINDOW}
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
