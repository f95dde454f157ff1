"""Broadcast-hint sweeps (VERDICT r8 item 1, finished by the r10 sweep of
VERDICT r9 item 1): queries that force-broadcast tables growing linearly
with sf had their hints DROPPED — at 100 TB a forced broadcast of |users| /
part / supplier / customer is an OOM. These tests pin the other half of
the contract: at fixture scale AQE still converts the unhinted join to a
broadcast hash join at runtime, so the bench does not regress. Each test
executes the query (AQE finalizes plans only at runtime) and asserts the
FINAL adaptive plan.

Round 9 swept six analytics/relational sites; round 10 swept the last 11 —
the classic TPC-H part/supplier dim hints (tpch_extra + tpch_partsupp),
emptying tests/test_plan_lint.py::FORCED_BROADCAST_ALLOWLIST — plus the
one guarded site outside the lint's reach, dedup_incremental's
prior-corpus hash broadcast (bcast.maybe_broadcast count guard).

Values are covered by the oracle gate (every swept query re-proven in the
round's driver window); these tests pin the PLAN.
"""

from __future__ import annotations

import pytest

from log_agent_spark.plans import analytics, relational, tpch_extra, tpch_partsupp

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    # collect() drives THIS DataFrame's QueryExecution (a noop write would
    # plan a separate command and leave df's adaptive plan unfinalized);
    # all six results are k-row aggregates at sf0.001, so this is cheap
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "fn",
    [
        # growing build side is an AGGREGATE (size unknown statically →
        # the conversion is genuinely AQE's runtime decision):
        analytics.q_events_retention_cohort,   # per-user first-seen
        analytics.q_cohort_ltv,                # per-customer first month
        # growing build side is a parquet dim (static size estimate or
        # AQE — either path must still land on a broadcast at this sf):
        analytics.q_stats_regression_by_brand,  # part
        analytics.q_supplier_leadtime,          # supplier
        analytics.q_nation_share_of_region,     # customer
    ],
    ids=lambda fn: fn.__name__,
)
def test_unhinted_growing_join_broadcasts_at_fixture_scale(spark, fn):
    plan = _final_plan(fn(spark, SF))
    assert "isFinalPlan=true" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # the sweep's point: no OOM-risk hint survives, so a SortMergeJoin
    # fallback must remain AVAILABLE to AQE at scale — nothing to assert
    # for that here beyond the absence of the hint (grep-audited); the
    # broadcast we see is AQE's choice at THIS size, not a forced plan.


@pytest.mark.parametrize(
    "fn",
    [
        # r10 sweep: part/supplier slices (raw growing dims, previously
        # hinted) — nation/region keep their hints, everything else is
        # AQE's runtime call:
        tpch_extra.q07_volume_shipping,       # supplier
        tpch_extra.q08_market_share,          # part + supplier
        tpch_extra.q09_product_profit,        # part + supplier
        tpch_extra.q14_promo_effect,          # part
        tpch_extra.q17_small_qty_revenue,     # part slice + per-part agg
        tpch_extra.q19_banded_revenue,        # part
        tpch_extra.q21_waiting_suppliers,     # supplier
        tpch_partsupp.q02_min_cost_supplier,  # part + supplier
        tpch_partsupp.q11_important_stock,    # supplier
        tpch_partsupp.q16_supplier_part_counts,  # part + complaint suppliers
        tpch_partsupp.q20_promotion_suppliers,   # part semi-join
    ],
    ids=lambda fn: fn.__name__,
)
def test_unhinted_tpch_dim_join_broadcasts_at_fixture_scale(spark, fn):
    plan = _final_plan(fn(spark, SF))
    assert "isFinalPlan=true" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_dedup_incremental_prior_broadcast_is_count_guarded(spark):
    """r10 sweep of VERDICT r9 #2: the prior-corpus hash set broadcast in
    dedup_incremental routes through bcast.maybe_broadcast — under the
    row-count bound the final plan broadcasts the anti-join build side;
    over it, the helper returns the frame unhinted."""
    from log_agent_spark.operators import dedup

    plan = _final_plan(dedup.q_dedup_incremental(spark, SF))
    assert "isFinalPlan=true" in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_dedup_incremental_shuffle_path_equals_broadcast_path(spark, monkeypatch):
    """Guard invariance: forcing the over-limit route (shuffle anti-join)
    must produce byte-identical results to the broadcast route — the
    guard is a plan decision, never a semantics decision."""
    from log_agent_spark.operators import dedup

    base = sorted(
        dedup.q_dedup_incremental(spark, SF).collect(),
        key=lambda r: r.lang,
    )
    # force the over-limit route by making the guard a pass-through (the
    # limit default is frozen at def time, so patching the module global
    # would NOT reach it — the SHINGLE_DF_CAP import-freeze class)
    monkeypatch.setattr(
        dedup, "maybe_broadcast", lambda df, n_rows_bound, limit=0: df
    )
    forced = sorted(
        dedup.q_dedup_incremental(spark, SF).collect(),
        key=lambda r: r.lang,
    )
    assert base == forced


def test_maybe_broadcast_guard_routes_on_bound(spark):
    from log_agent_spark.bcast import maybe_broadcast

    left = spark.range(100).withColumnRenamed("id", "k")
    build = spark.range(4).withColumnRenamed("id", "k")

    def _opt(bound):
        j = left.join(maybe_broadcast(build, n_rows_bound=bound, limit=10), "k")
        return j._jdf.queryExecution().optimizedPlan().toString()

    assert "strategy=broadcast" in _opt(4)
    assert "strategy=broadcast" not in _opt(11)


def test_dq_audit_anti_join_broadcasts_at_fixture_scale(spark):
    plan = _final_plan(relational.q_dq_constraint_audit(spark, SF))
    assert "isFinalPlan=true" in plan, plan
    # the orders→customer orphan check: broadcast ANTI join at this sf
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_shingle_df_cap_is_frozen_at_import(spark, monkeypatch):
    """ADVICE r8: the engine's default cap must be frozen at import like
    the oracle SQL strings are — mutating the module global after import
    must NOT change what a default call prunes."""
    from log_agent_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "abcdefgh") for i in range(4)], "doc_id long, text string"
    )
    sh = dedup.shingles(docs)
    # df of every shingle is 4; a cap of 3 would prune everything
    monkeypatch.setattr(dedup, "SHINGLE_DF_CAP", 3)
    kept = dedup.df_capped_shingles(sh).count()
    assert kept == sh.count(), "default cap must stay the import-time 512"
