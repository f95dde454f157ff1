"""Plan-shape assertions for the partsupp-derived TPC-H queries (Q2, Q11,
Q16, Q20). Values are covered by the DuckDB oracle gate; these tests pin
the properties that keep the plans viable at 100 TB: dimension joins
broadcast, the partsupp derivation partial-aggregates map-side, and the
scalar-subquery threshold (Q11) broadcasts a singleton instead of
recomputing the big aggregate."""

from __future__ import annotations

from log_agent_spark.plans import tpch_partsupp

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_derivation_partial_aggregates(spark):
    plan = _plan(tpch_partsupp.derived_partsupp(spark, SF))
    assert "partial" in plan.lower(), plan


def test_q02_broadcasts_all_dims(spark):
    plan = _plan(tpch_partsupp.q02_min_cost_supplier(spark, SF))
    # part, supplier, nation, region all broadcast; no sort-merge join
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan


def test_q02_min_is_window_not_self_join(spark):
    plan = _plan(tpch_partsupp.q02_min_cost_supplier(spark, SF))
    assert "Window" in plan, plan
    # lineitem + 4 dims = 5 scans; a self-join min would add a 6th
    assert plan.count("FileScan") <= 5, plan


def test_q11_threshold_is_broadcast_singleton(spark):
    plan = _plan(tpch_partsupp.q11_important_stock(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_q16_anti_join_broadcast(spark):
    plan = _plan(tpch_partsupp.q16_supplier_part_counts(spark, SF))
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q20_semi_joins(spark):
    plan = _plan(tpch_partsupp.q20_promotion_suppliers(spark, SF))
    assert plan.count("LeftSemi") >= 2, plan


def test_q20_rows_are_nation1_suppliers(spark):
    rows = tpch_partsupp.q20_promotion_suppliers(spark, SF).collect()
    names = [r.s_name for r in rows]
    assert names == sorted(names)
