"""Plan-shape assertions for the sketch / quantization / graph additions:
broadcast where a side is provably small (codebooks, sketches, LM vocab),
no cartesian blowups, bounded exchange counts. Values are covered by the
oracle gate; these tests pin the PLAN the 100 TB story depends on."""

from __future__ import annotations

from log_agent_spark.operators import dedup, graph, similarity, text
from log_agent_spark.plans import events

SF = "/root/testdata/sf0.001"


from tests._plans import body_plan as _body_plan


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pq_adc_broadcasts_codebook_and_distance_tables(spark):
    plan = _plan(similarity.q_ann_pq_adc(spark, SF))
    # codebook (M*K rows) and query distance table (Q*M*K rows) broadcast;
    # candidates never shuffle for the encode join
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bloom_prefilter_broadcasts_filter(spark):
    plan = _body_plan(dedup.q_dedup_bloom_prefilter, spark, SF)
    # the ≤W-row position table and the prior-hash set both broadcast
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_countmin_broadcasts_sketch(spark):
    plan = _plan(events.q_countmin_heavyhitters(spark, SF))
    # the d*w-cell sketch is broadcast to the probe side
    assert "BroadcastHashJoin" in plan, plan


def test_bigram_lm_broadcasts_models(spark):
    plan = _plan(text.q_bigram_logprob(spark, SF))
    # unigram (x2 roles), bigram, and consts tables all broadcast: the
    # held-out scan is never shuffled until the final per-doc aggregate
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_triangle_count_no_cartesian_no_wedge_shuffle(spark):
    plan = _plan(graph.q_graph_triangle_count(spark, SF))
    assert "CartesianProduct" not in plan, plan
    # adjacency intersection is a Generate (explode), not a 3rd self-join
    assert "Generate" in plan, plan


def test_lpa_no_cartesian(spark):
    plan = _body_plan(graph.q_graph_label_propagation, spark, SF)
    assert "CartesianProduct" not in plan, plan
