"""Round 9 broadcast-hint sweep (VERDICT r8 item 1): the six queries that
force-broadcast tables growing linearly with sf had their hints DROPPED —
at 100 TB a forced broadcast of |users| / part / supplier / customer is an
OOM. These tests pin the other half of the contract: at fixture scale AQE
still converts the unhinted join to a broadcast hash join at runtime, so
the bench does not regress. Each test executes the query (AQE finalizes
plans only at runtime) and asserts the FINAL adaptive plan.

Values are covered by the oracle gate (all six re-proven in the r9 driver
window); these tests pin the PLAN.
"""

from __future__ import annotations

import pytest

from log_agent_spark.plans import analytics, relational

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
