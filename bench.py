"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "total_query_time", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is fully materialized through the JVM-side ``noop`` sink (no
driver-side row transfer, no Python serialization) — the measured time is
scan + shuffle + compute, i.e. what a cluster run would scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative headline set: one per operator family (SURVEY.md §2).
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q09_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_volume",
    "q21_waiting_suppliers",
    "lineitem_sequence_audit",
    "dq_constraint_audit",
    "events_variant_extract",
    "lateral_explode",
    "recursive_tree_rollup",
    "events_gaps_islands",
    "events_retention_cohort",
    "basket_part_pairs_lift",
    "customer_rfm",
    "stats_regression_by_brand",
    "pareto_revenue_concentration",
    "revenue_seasonality",
    "cohort_ltv",
    "order_backlog",
    "supplier_leadtime",
    "nation_share_of_region",
    "events_top_movers",
    "sample_hash_split",
    "unpivot_measures",
    "histogram_totalprice",
    "histogram_equidepth",
    "text_langid_confusion",
    "text_vocab_growth",
    "text_zipf_fit",
    "part_supplier_hhi",
    "anomaly_zscore",
    "anomaly_mad",
    "gapfill_locf",
    "time_weighted_avg",
    "sql_interface",
    "window_topk_per_group",
    "agg_cube",
    "events_tumbling_window",
    "events_sessionize",
    "events_hypertable_rollup",
    "events_asof_join",
    "events_range_join",
    "events_funnel",
    "events_pivot",
    "window_range_frame",
    "events_approx_sketches",
    "debounce_keep_last",
    "dedup_exact",
    "dedup_connected_components",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_recall_report",
    "ann_ivf",
    "ann_kmeans_step",
    "ann_hard_negatives",
    "embeddings_power_iteration",
    "skew_salted_distinct",
    "text_quality_score",
    "text_token_frequency",
    "text_token_bpe",
    "text_tfidf_topterms",
    "text_chunking",
    "text_redact_pii",
    "text_bm25_search",
    "text_inverted_index",
    "text_unigram_logprob",
    "sample_shuffle_shard",
    "graph_pagerank",
    "layout_zorder_stats",
    "events_scd2_dimension",
    "events_transition_matrix",
    "events_pit_versioned_join",
    "events_dwell_percentiles",
    "events_error_bursts",
    "events_weekly_load_profile",
    "events_user_lifecycle",
    "events_rolling_7d_users",
    "dedup_minhash_incremental",
    "dedup_lsh_quality",
    "dedup_source_overlap",
    "text_decontaminate",
    "corpus_snapshot_diff",
    "q02_min_cost_supplier",
    "q11_important_stock",
    "sample_source_mixture",
    "sample_importance_weighted",
    "media_decode_meta",
    "media_frame_sample",
    "ingest_logfile_tree",
    "kafka_wire_roundtrip",
    "graph_triangle_count",
    "dedup_semantic_clustered",
    "dedup_bloom_prefilter",
    "events_countmin_heavyhitters",
    "events_hll_report",
    "events_kmv_set_ops",
    "events_attribution_multitouch",
    "ann_pq_adc",
    "sample_weighted_reservoir",
    "orders_join_ivm",
    "graph_label_propagation",
    "text_bigram_logprob",
    "dedup_repeated_spans",
    "text_bpe_merge_step",
    "events_quantile_sketch_report",
    "graph_bfs_hops",
    "events_ewma_daily",
    "events_hll_incremental",
    "events_ab_test_ztest",
    "sample_bootstrap_ci",
    "media_aspect_buckets",
    "text_quality_classifier",
    "sample_temperature_mixture",
    "text_perplexity_filter",
    "events_sax_similarity",
    "events_cusum_shift",
    "ingest_avro_roundtrip",
    "dedup_split_leakage",
    "dedup_group_split",
    "pipeline_corpus_funnel",
    "dedup_containment",
    "graph_kcore",
    "events_seasonal_anomaly",
    "events_forecast_holt",
    "media_shard_manifest",
    "corpus_drift_psi",
    "events_trend_robust",
    "ann_matryoshka_recall",
    "events_forecast_holt_winters",
    "text_contamination_spans",
    "text_ngram_novelty",
    "dedup_soft_weights",
    "events_forecast_backtest",
    "dedup_minhash_estimate",
    "sample_split_balance",
    "ann_ivf_health",
    "embedding_dim_audit",
    "mixture_doremi_step",
    "curriculum_quality_bins",
    "text_pmi_top_pairs",
    "logs_template_mining",
    "media_features",
    "graph_modularity",
    "ann_ivf_multiprobe",
    "mixture_token_budget",
    "events_histogram_incremental",
    "pipeline_corpus_build",
    "ann_nprobe_recall",
    "decontam_ngram_sweep",
    "corpus_datasheet",
    "dedup_savings",
    "graph_degree_powerlaw",
    "media_phash_neardup",
    "text_langid_fertility",
    "text_quality_calibration",
    "text_char_entropy",
    "dedup_cluster_sizes",
    "events_interval_overlap",
    "ts_autocorrelation",
    "graph_jaccard_neighbors",
    "skew_key_profile",
    "privacy_kanonymity",
    "dq_benford",
    "gdpr_cascade",
    "er_blocking_plan",
    "er_match_pairs",
    "er_golden_record",
    "privacy_tcloseness",
    "governance_license_taint",
    "dq_schema_drift",
    "join_cardinality_estimate",
    "skew_pairgen_radar",
    "text_judge_agreement",
    "ann_ndcg_report",
    "label_noise_audit",
    "al_margin_sample",
    "text_vocab_coverage",
    "privacy_generalization_ladder",
    "events_slo_burn_rate",
    "embedding_drift_audit",
    "graph_cc_incremental",
    "split_leakage_audit",
    "dp_contribution_bounds",
    "text_repetition_gates",
    "events_ooo_depth",
]


# ---------------------------------------------------------------------------
# Host-steal canary (VERDICT r6 item 1). BENCH_r06 published a phantom 1.37x
# slowdown because a multi-hour CPU-steal window on this shared host outlasted
# the entire run — min-of-N and the cross-run prior both sample INSIDE the
# window, so no per-query gate can detect it. The canary is a fixed
# single-threaded pure-Python spin (2.5% min-of-3 jitter on a quiet host,
# measured 2026-08-15; a JVM probe was tried first and had 17% scheduling/GC
# jitter) timed at run start / middle / end:
#   * spread gate:   max/min of the three samples > 1.20 -> steal began or
#                    ended mid-run;
#   * absolute gate: min of the three > 1.35x the committed quiet-window
#                    baseline -> steal spans the whole run (the r6 mode).
# Either gate -> the JSON line carries "contaminated" and the process exits 3
# so tools/round_gate.py retries in a later window instead of committing a
# corrupted artifact.
# ---------------------------------------------------------------------------
# Min-of-3 spin on THIS grading host's quiet window (2026-08-15). The
# absolute gate is a per-host calibration by construction — the spin's
# wall-clock shifts tens of percent across CPU models and CPython builds —
# so on any other machine (or after an interpreter upgrade) recalibrate
# rather than letting every run flag contaminated: run
# `python -c "import bench; print(bench._canary_sample())"` in a known-quiet
# window and export SPARK_GRAFT_CANARY_BASELINE with that value. The
# committed constant stays authoritative for the grading container family.
CANARY_BASELINE_SEC = float(
    os.environ.get("SPARK_GRAFT_CANARY_BASELINE", "0.70")
)
CANARY_SPREAD_LIMIT = 1.20
CANARY_ABS_LIMIT = 1.35
_CANARY_ITERS = 8_000_000


def _canary_sample() -> float:
    """Min-of-3 of a fixed single-threaded spin, GC paused: host-speed
    calibration that is immune to JVM task scheduling and heap state."""
    import gc

    best = float("inf")
    gc.disable()
    try:
        for _ in range(3):
            t0 = time.perf_counter()
            x = 0
            for i in range(_CANARY_ITERS):
                x = (x * 31 + i) & 0xFFFFFFFF
            best = min(best, time.perf_counter() - t0)
    finally:
        gc.enable()
    return best


def _mc_spin(iters: int) -> int:
    x = 0
    for i in range(iters):
        x = (x * 31 + i) & 0xFFFFFFFF
    return x


def _canary_mc_sample(nproc: int = 8) -> float:
    """Min-of-2 wall time for `nproc` CONCURRENT spins in separate
    processes (threads would serialize on the GIL). The single-thread
    canary measures host speed for ONE core and systematically
    under-measures multi-core steal: twice in the r10 round-end window a
    spread-clean run still carried 1.5-2x inflation concentrated on the
    parallel-heavy (graph/funnel) queries. This sample inflates with
    aggregate core contention. REPORT-ONLY for now — recorded in the
    canary dict (mc_start/mc_mid/mc_end/mc_spread) so quiet-vs-contended
    history accumulates in committed BENCH_DETAILs; gating needs that
    calibration first (pool spawn overhead and the 8-of-32-core shape
    make its quiet-window variance different from the scalar spin's)."""
    import multiprocessing as mp

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        with mp.Pool(nproc) as pool:
            pool.map(_mc_spin, [_CANARY_ITERS] * nproc)
        best = min(best, time.perf_counter() - t0)
    return best


def _canary_verdict(canary: dict) -> list[str]:
    """Annotate the canary dict with spread / vs_baseline and return the
    contamination findings (empty = run is publishable). Pure, for tests."""
    c_vals = [canary["start"], canary["mid"], canary["end"]]
    canary["spread"] = round(max(c_vals) / min(c_vals), 3)
    canary["vs_baseline"] = round(min(c_vals) / CANARY_BASELINE_SEC, 3)
    mc_vals = [
        canary[k] for k in ("mc_start", "mc_mid", "mc_end") if k in canary
    ]
    if len(mc_vals) == 3:
        # report-only (see _canary_mc_sample): never contaminates the run
        canary["mc_spread"] = round(max(mc_vals) / min(mc_vals), 3)
    contaminated: list[str] = []
    if canary["spread"] > CANARY_SPREAD_LIMIT:
        contaminated.append(
            f"canary spread {canary['spread']} > {CANARY_SPREAD_LIMIT}"
            " (steal window began or ended mid-run)"
        )
    if canary["vs_baseline"] > CANARY_ABS_LIMIT:
        contaminated.append(
            f"canary min {min(c_vals)}s is {canary['vs_baseline']}x the"
            f" quiet-window baseline {CANARY_BASELINE_SEC}s"
            " (steal window spans the whole run)"
        )
    return contaminated


def _scaling_priors() -> dict[str, float]:
    """Per-query sf0.1 seconds from the committed SCALING.md probe table.

    Used as a cross-run prior for the noise gate: a sustained CPU-steal
    window on this shared host can span BOTH best-of-2 attempts of one
    query, in which case the attempts *agree* and the intra-run ratio
    check never fires (round 4 watched ``supplier_leadtime`` publish a
    phantom 1.52x this way). The committed scale-probe measurement was
    taken in a different process at a different time, so it is the one
    reference point a single steal window cannot contaminate.
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.md")
    priors: dict[str, float] = {}
    try:
        with open(path) as f:
            for line in f:
                if not line.startswith("| `"):
                    continue
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                if len(cells) < 4:
                    continue
                try:
                    priors[cells[0].strip("`")] = float(cells[3])
                except ValueError:
                    continue
    except OSError:
        pass
    return priors


def main() -> None:
    import __spark_entry__ as entrymod
    from log_agent_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # smoke-run subset: SPARK_GRAFT_BENCH_ONLY=q01_pricing_summary,anomaly_mad
    # (harness plumbing checks without the full ~13 min suite)
    headline = HEADLINE
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = [s for s in only.split(",") if s]
        unknown = [s for s in wanted if s not in qs]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown queries: {unknown}")
        headline = wanted

    # JVM + parquet-footer warmup so q1 doesn't pay session startup, and a
    # trivial mapInPandas so the first Pandas-UDF query doesn't pay Python
    # worker-pool startup (one interpreter per core).
    qs["q01_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(256).repartition(int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Best-of-2 per query, escalating to best-of-3 when the first two
    # attempts disagree by >1.5x: the host is shared, and a sustained
    # CPU-steal window can span BOTH attempts of one query — round 3
    # published graph_triangle_count at 7.5 s when an off-window re-measure
    # gave 4.7 s (VERDICT r3 "What's wrong" #2). Min-of-N is the standard
    # noise-robust estimator for deterministic workloads; the third attempt
    # buys a sample outside the steal window exactly when the first two
    # look noise-contaminated.
    NOISE_RATIO = 1.5
    # Always-escalate set: queries with a published noise incident where
    # BOTH best-of-2 attempts landed inside one steal window WITHOUT
    # tripping the ratio gate (r5 shipped pipeline_corpus_funnel at
    # 4.27 s; an off-window min-of-3 re-measure gave 3.37 s — a 27%
    # phantom regression flagged in VERDICT r5). Three attempts from the
    # start buys the outside-the-window sample unconditionally.
    # text_contamination_spans / graph_degree_powerlaw: the r7 artifact
    # published them at 2.15x / 1.58x their committed history with their
    # code untouched and ambient only 1.13x (VERDICT r7 item 3) — the
    # same both-attempts-stolen mode; adjudicated by an off-window
    # min-of-3 re-measure (see BENCH_DETAIL.json retime note, r8).
    ALWAYS_BEST3 = {
        "pipeline_corpus_funnel",
        "text_contamination_spans",
        "graph_degree_powerlaw",
    }
    # The SCALING.md prior only describes sf0.1 runs; at any other SF the
    # cross-run check would compare apples to oranges, so disable it.
    priors = _scaling_priors() if SF_DIR.rstrip("/").endswith("sf0.1") else {}
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    flaky: dict[str, str] = {}  # passed once, then crashed — keep the trace
    retimed: list[str] = []  # queries that needed the third attempt
    retimed_vs_prior: list[str] = []  # third attempt forced by the prior
    canary = {"start": round(_canary_sample(), 3)}
    canary["mc_start"] = round(_canary_mc_sample(), 3)
    mid_at = len(headline) // 2
    for qi, name in enumerate(headline):
        if qi == mid_at:
            canary["mid"] = round(_canary_sample(), 3)
            canary["mc_mid"] = round(_canary_mc_sample(), 3)
        attempts: list[float] = []
        n_attempts = 3 if name in ALWAYS_BEST3 else 2
        i = 0
        while i < n_attempts:
            i += 1
            t0 = time.perf_counter()
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                attempts.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — one bad query must
                # not void the other 120+ measurements on the driver's box
                failures[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
            finally:
                # Measurement hygiene after EVERY attempt, failed ones
                # included (outside the timer), JMH-style: drop blocks
                # pinned by queries that persist() intermediates and force
                # a full GC — otherwise storage + garbage accumulate
                # across the suite and later allocation-heavy queries
                # measure the prior 70 queries' heap pressure instead of
                # themselves (observed 4-20x inflation on the
                # wire-roundtrip query). A failed attempt must not skip
                # this either, or its pinned blocks tax the NEXT query.
                spark.catalog.clearCache()
                spark._jvm.System.gc()
            if (
                len(attempts) == 2
                and n_attempts == 2
                # heavy tail only: for sub-second queries the first attempt's
                # plan-compilation overhead alone trips the ratio (79/160
                # escalated in a sf0.01 smoke run), and their noise can't
                # distort the headline anyway
                and min(attempts) > 1.0
            ):
                if max(attempts) > NOISE_RATIO * min(attempts):
                    n_attempts = 3
                    retimed.append(name)
                elif name in priors and min(attempts) > NOISE_RATIO * priors[name]:
                    # Both attempts agree but sit far above the committed
                    # scale-probe time → likely a steal window spanning both
                    # attempts; buy one sample outside it. If the third
                    # attempt is just as slow, min() keeps it — a genuine
                    # code-change regression still surfaces, it just costs
                    # one extra run to publish.
                    n_attempts = 3
                    retimed_vs_prior.append(name)
        # Surface the unconditional ALWAYS_BEST3 escalation in the
        # published artifact (VERDICT r7 item 3) — but only AFTER all
        # three attempts actually completed: appending before the loop
        # would publish a first-attempt-crashed query as "best-of-3"
        # (ADVICE r8). A partial measurement lands in failures/flaky,
        # never in retimed_best_of_3.
        if name in ALWAYS_BEST3 and len(attempts) == n_attempts:
            retimed.append(name)
        # keep a clean earlier measurement even if a later attempt failed,
        # but record the late failure as flaky instead of dropping it
        # (ADVICE r2: a pass-then-crash query must not report as clean)
        if attempts:
            timings[name] = round(min(attempts), 3)
            late = failures.pop(name, None)
            if late is not None:
                flaky[name] = late

    canary.setdefault("mid", canary["start"])  # empty/1-query HEADLINE guard
    canary.setdefault("mc_mid", canary["mc_start"])
    canary["end"] = round(_canary_sample(), 3)
    canary["mc_end"] = round(_canary_mc_sample(), 3)
    contaminated = _canary_verdict(canary)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # The driver keeps only a short tail of stdout (round 1 lost the whole
    # bench signal to front-truncation of a 4 KB line). Full per-query map
    # goes to BENCH_DETAIL.json; stdout gets ONE short line whose
    # "queries" field holds just the slowest 10 so the line stays well
    # under the truncation window.
    detail = {
        "metric": "total_query_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
        "failures": failures,
        "flaky": flaky,
        "retimed_best_of_3": retimed,
        "retimed_vs_prior": retimed_vs_prior,
        "canary": canary,
        "contaminated": contaminated,
    }
    # a SPARK_GRAFT_BENCH_ONLY smoke run must not clobber the committed
    # full-suite artifact (review r7): its detail goes to a sidecar file
    detail_name = (
        "BENCH_DETAIL.subset.json" if only else "BENCH_DETAIL.json"
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    top10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    line = {
        "metric": "total_query_time",
        "value": detail["value"],
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "n_failures": len(failures),
        "n_flaky": len(flaky),
        "canary": canary,
        "queries": top10,
        "detail": detail_name,
    }
    if only:
        line["subset"] = True
    if contaminated:
        line["contaminated"] = contaminated
    print(json.dumps(line))
    if contaminated:
        # exit non-zero so round_gate retries in a later window instead of
        # committing a corrupted artifact (the r6 221.7s lesson); the JSON
        # line above is still printed so a driver-side run records the
        # timings WITH the contamination flag rather than nothing.
        sys.exit(3)


if __name__ == "__main__":
    main()
