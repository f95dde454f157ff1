"""Plan-shape assertions for the TPC-H-style relational family: dimension
broadcast, scan-level filter pushdown, and column pruning — the properties
that keep these joins viable when lineitem is 100 TB. Values are covered by
the oracle gate; these tests pin the PLAN."""

from __future__ import annotations

from log_agent_spark.plans import relational, tpch_extra

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q06_filters_reach_the_scan(spark):
    plan = _plan(relational.q06_forecast_revenue(spark, SF))
    # shipdate/discount/quantity predicates pushed to the parquet reader
    assert "PushedFilters: [" in plan, plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400], plan


def test_q06_scan_is_column_pruned(spark):
    plan = _plan(relational.q06_forecast_revenue(spark, SF))
    read = plan.split("ReadSchema")[1][:400]
    # only the 4 referenced columns are read, not the 11-column table
    assert "l_extendedprice" in read and "l_discount" in read, plan
    assert "l_returnflag" not in read and "l_tax" not in read, plan


def test_q09_broadcasts_all_dimensions(spark):
    plan = _plan(tpch_extra.q09_product_profit(spark, SF))
    # part (filtered), supplier, nation broadcast; only the fact-fact
    # lineitem⋈orders join may shuffle
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_q10_broadcasts_nation(spark):
    plan = _plan(relational.q10_returned_items(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_q10_returnflag_pushed_down(spark):
    plan = _plan(relational.q10_returned_items(spark, SF))
    pushed = [seg[:300] for seg in plan.split("PushedFilters")[1:]]
    assert any("l_returnflag" in seg for seg in pushed), plan


def test_topk_uses_take_ordered_not_global_sort(spark):
    plan = _plan(relational.q03_shipping_priority(spark, SF))
    # orderBy().limit(k) must compile to per-partition heap + driver merge
    assert "TakeOrderedAndProject" in plan, plan


def test_sequence_audit_two_shuffles_max(spark):
    plan = _plan(relational.q_lineitem_sequence_audit(spark, SF))
    # per-order agg (1 shuffle on l_orderkey), join reuses that key or
    # broadcasts, status re-agg coalesces under AQE
    assert plan.count("Exchange") <= 4, plan
    assert "partial" in plan.lower(), plan
