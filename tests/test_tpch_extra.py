"""Plan-shape assertions for the extended TPC-H and complex-type queries:
dimension joins must broadcast (no shuffle of the fact side for dim
lookups), pre-aggregations must be partial (map-side combine), and scans
must prune columns. These are the properties that keep the plans viable at
100 TB — row values are covered by the DuckDB oracle gate."""

from __future__ import annotations

from log_agent_spark.plans import complex_types, tpch_extra

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q07_broadcasts_dims(spark):
    plan = _plan(tpch_extra.q07_volume_shipping(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    # both nation copies + supplier broadcast -> at least 3 broadcast joins
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_q08_single_agg_pass(spark):
    plan = _plan(tpch_extra.q08_market_share(spark, SF))
    # the share is a conditional-sum ratio: one aggregate, no self-join
    assert plan.count("HashAggregate") <= 2, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q09_partial_aggregation(spark):
    plan = _plan(tpch_extra.q09_product_profit(spark, SF))
    # map-side combine before the (nation, year) shuffle
    assert "partial" in plan.lower(), plan


def test_q18_having_prefilter_before_customer_join(spark):
    df = tpch_extra.q18_large_volume(spark, SF)
    plan = _plan(df)
    # the sum_qty>150 filter must sit on the lineitem aggregate, not after
    # the customer join — i.e. a Filter above a HashAggregate
    assert "Filter" in plan and "HashAggregate" in plan, plan
    rows = df.collect()
    assert all(r.sum_qty > 150 for r in rows)


def test_q19_or_of_ands_single_pass(spark):
    plan = _plan(tpch_extra.q19_banded_revenue(spark, SF))
    # one lineitem scan, no shuffle join (part broadcasts)
    assert plan.count("FileScan") == 2, plan  # lineitem + part only
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q22_anti_join(spark):
    plan = _plan(tpch_extra.q22_sales_opportunity(spark, SF))
    assert "LeftAnti" in plan, plan


def test_array_ops_prunes_columns(spark):
    plan = _plan(complex_types.q_array_ops(spark, SF))
    # only doc_id + text read from the documents scan
    assert "ReadSchema" in plan, plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read and "lang" not in read, read


def test_lateral_explode_filter_below_generate(spark):
    plan = _plan(complex_types.q_lateral_explode(spark, SF))
    # the doc_id<40 predicate must reach the scan, not run post-explode
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,40)]" in plan or (
        "LessThan(doc_id,40)" in plan
    ), plan
    assert "Generate explode" in plan, plan


def test_percentiles_values_monotone(spark):
    rows = complex_types.q_agg_percentiles(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p25_qty <= r.p50_qty <= r.p75_qty
