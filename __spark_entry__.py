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
# rollup/temporal/skew/events-head, round 4 sampling/ANN/analytics/
# curation — 190/241 cumulative green after r4).
# Round-5 window, per VERDICT r4's ranked list: 1 canary (q01) + 49 of the
# final 51 never-driver-verified queries — the events tail (13), the text
# tail (14, incl. the round-5-hardened char_entropy/langid_fertility),
# privacy/governance (5), ingest/kafka (3), and every r4 late addition.
# Deferred to round 6 (2 lowest-risk ingest entries): ingest_text_files
# (simple whole-file read with a live read_blob oracle) and kafka_envelope
# (byte-golden frozen-parquet oracle, envelope bytes also pinned in
# tests/). Queries ADDED after this rotation froze (the round-5 ER/privacy/
# governance batch: er_match_pairs, er_golden_record, privacy_tcloseness,
# governance_license_taint, dq_schema_drift, + any later additions) also
# lack driver-hard signal until the r6 window picks them up — plan r6 as
# those two + every COVERAGE.json row still marked unverified, then
# re-proofs.
_R5_WINDOW = [
    # relational canary (driver-green r1, re-proved r3/r4)
    "q01_pricing_summary",
    # events tail (13) — incl. the streaming-semantics batch twins
    "events_error_bursts",
    "events_pit_versioned_join",
    "events_transition_matrix",
    "events_scd2_dimension",
    "events_rolling_7d_users",
    "events_cdc_apply",
    "events_session_paths",
    "events_pivot",
    "events_tumbling_window",
    "events_sliding_window",
    "events_sessionize",
    "debounce_keep_last",
    "dedup_keep_latest",
    # text tail (14)
    "text_token_bpe",
    "text_tfidf_topterms",
    "text_quality_score",
    "text_langid_heuristic",
    "text_doc_fingerprint",
    "text_lang_profile",
    "text_token_frequency",
    "text_pmi_top_pairs",
    "logs_template_mining",
    "text_langid_fertility",
    "text_quality_calibration",
    "text_char_entropy",
    "text_judge_agreement",
    "text_vocab_coverage",
    # privacy / governance (5)
    "privacy_kanonymity",
    "privacy_ldiversity",
    "privacy_generalization_ladder",
    "gdpr_cascade",
    "dq_benford",
    # ingest / kafka (3) — tree walker, wire roundtrips
    "ingest_logfile_tree",
    "kafka_wire_roundtrip",
    "ingest_avro_roundtrip",
    # similarity / label audits (5)
    "ann_ndcg_report",
    "label_noise_audit",
    "al_margin_sample",
    "embedding_drift_audit",
    "media_phash_neardup",
    # graph (2) — incl. the now-executable jaccard hub cap
    "graph_cc_incremental",
    "graph_jaccard_neighbors",
    # linkage / stats tail (7)
    "er_blocking_plan",
    "join_cardinality_estimate",
    "skew_key_profile",
    "ts_autocorrelation",
    "events_slo_burn_rate",
    "events_interval_overlap",
    "dedup_cluster_sizes",
]

# Stable alias for tools (tools/make_coverage.py): the per-round list above
# is renamed each rotation; this name is not.
DRIVER_WINDOW = _R5_WINDOW


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3 shipping priority
    (3-way join + agg + deterministic top-k)."""
    return relational.q03_shipping_priority(spark, "/root/testdata/sf0.001")


def _ordered(full: dict) -> dict:
    """Window names first (in window order), then the rest in module order."""
    missing = [name for name in _R5_WINDOW if name not in full]
    if missing:
        # a typo in the window list must fail loudly, not silently shrink
        # the driver's 50-slot verification window (and must survive -O,
        # so no assert)
        raise ValueError(f"window names not in queries(): {missing}")
    out = {name: full[name] for name in _R5_WINDOW}
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
