"""Plan-shape assertions for the sampling/reshaping/graph family — the
100 TB viability properties SCALE.md claims: small sides broadcast, no
cartesian blowups, column-pruned scans, map-side partial aggregation.
Row values are covered by the oracle gate; these tests pin the PLAN."""

from __future__ import annotations

from log_agent_spark.operators import dedup
from log_agent_spark.plans import sampling

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hash_split_no_shuffle_before_agg(spark):
    plan = _plan(sampling.q_sample_hash_split(spark, SF))
    # split assignment is a pure map: exactly one exchange (the final agg)
    assert plan.count("Exchange") <= 2, plan
    assert "partial" in plan.lower(), plan


def test_anomaly_zscore_broadcasts_stats(spark):
    plan = _plan(sampling.q_anomaly_zscore(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_winsorized_broadcasts_quantiles(spark):
    plan = _plan(sampling.q_winsorized_stats(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_gapfill_grid_is_generated_not_joined(spark):
    plan = _plan(sampling.q_gapfill_locf(spark, SF))
    # the hour spine comes from sequence()+explode (Generate), not a scan
    assert "Generate" in plan, plan
    # types table broadcast onto the grid
    assert "Broadcast" in plan, plan


def test_unpivot_is_map_side(spark):
    plan = _plan(sampling.q_unpivot_measures(spark, SF))
    # unpivot = Expand (map-side row expansion); one agg shuffle after
    assert "Expand" in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_manifest_scans_prune_columns(spark):
    plan = _plan(sampling.q_training_manifest(spark, SF))
    # documents scan must not read `source`; embeddings must not read `label`
    assert "source" not in plan.split("ReadSchema")[1][:400], plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_incremental_dedup_is_broadcast_anti(spark):
    plan = _plan(dedup.q_dedup_incremental(spark, SF))
    assert "LeftAnti" in plan, plan
    assert "Broadcast" in plan, plan


def test_shuffle_shard_single_wide_shuffle(spark):
    plan = _plan(sampling.q_sample_shuffle_shard(spark, SF))
    # shard assignment is map-side; the window shuffle on (shard) is the
    # only wide exchange before the final agg — and agg keys == window
    # partition keys, so the exchange is reused (no second hash partition).
    assert plan.count("Exchange") <= 2, plan
    assert "Window" in plan, plan


def test_bm25_stats_broadcast_no_explode(spark):
    from log_agent_spark.operators import text

    plan = _plan(text.q_bm25_search(spark, SF))
    # scoring pass is array expressions over the scan: no Generate
    # (explode), corpus stats joined as a broadcast, top-k is a heap
    assert "Generate" not in plan, plan
    assert "Broadcast" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_unigram_model_broadcast_join(spark):
    from log_agent_spark.operators import text

    plan = _plan(text.q_unigram_logprob(spark, SF))
    # vocabulary-sized model must broadcast onto the exploded tokens
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_zorder_is_map_side_before_agg(spark):
    plan = _plan(sampling.q_layout_zorder_stats(spark, SF))
    # z-value + file assignment are integer expressions: no join, no
    # Generate — one partial-agg shuffle only
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_basket_pairs_joins_on_order_key(spark):
    from log_agent_spark.plans import analytics

    plan = _plan(analytics.q_basket_part_pairs_lift(spark, SF))
    # the pair generator must be a KEYED join on l_orderkey (bounded by
    # lines-per-order), never a cartesian pair space over parts
    assert "CartesianProduct" not in plan, plan
    assert "l_orderkey" in plan, plan


def test_supplier_leadtime_broadcasts_dims(spark):
    from log_agent_spark.plans import analytics

    plan = _plan(analytics.q_supplier_leadtime(spark, SF))
    # supplier and nation are broadcast; only the fact join shuffles
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_pagerank_no_cartesian_and_bounded_exchanges(spark):
    from log_agent_spark.operators import graph

    from tests._plans import body_plan

    plan = body_plan(graph.q_pagerank_trade_graph, spark, SF)
    # every per-round join is keyed (edges.src = ranks.node) — no
    # cartesian anywhere in the unrolled 3-iteration lineage. (Exchange
    # COUNTS are not assertable here: the textual plan re-prints the
    # persisted edge lineage at every reference.)
    assert "CartesianProduct" not in plan, plan


def test_split_balance_shares_sum_to_one(spark):
    """Within every split the source shares partition the chars (sum to
    1); deviation equals share minus global share per cell; the cells
    partition the corpus. (Per-split deviations need NOT sum to zero: a
    source absent from a small split contributes its global share to the
    imbalance — that residual is exactly what the audit surfaces.)"""
    from collections import defaultdict

    from log_agent_spark.plans.sampling import q_sample_split_balance
    from log_agent_spark.sources.tables import load_table

    rows = q_sample_split_balance(spark, "/root/testdata/sf0.001").collect()
    by_split = defaultdict(list)
    for r in rows:
        by_split[r.split].append(r)
        # deviation rounds the UNROUNDED share difference; recomputing from
        # the two already-rounded shares can differ by up to 1.5e-4
        assert abs(r.deviation - round(r.share_in_split - r.global_share, 4)) <= 2e-4
    assert set(by_split) == {"train", "val", "test"}
    for split, rs in by_split.items():
        assert abs(sum(r.share_in_split for r in rs) - 1.0) < 1e-3, split
    total = load_table(spark, "/root/testdata/sf0.001", "documents").count()
    assert sum(r.n_docs for r in rows) == total
