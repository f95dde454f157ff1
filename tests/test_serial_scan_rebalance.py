"""Plan pins for the late-r10 serial-scan rebalances and the
corpus_stage_flags shared-exchange fix.

Two regression classes these guard:

- The five measured input rebalances (text_repetition_gates,
  text_decontaminate, text_contamination_spans, dedup_repeated_spans,
  dedup_minhash_estimate) exist because the fixture parquet is a single
  row group: Spark's scan-parallelism floor is row groups, so the
  tokenize/shingle map work between the scan and the first exchange runs
  single-task without an explicit repartition (measured ~2x wall each at
  sf0.1). An accidental removal would not fail any value test — only the
  bench would quietly regress — so the plan shape is pinned here.

- corpus_stage_flags routes its exact-dedup survivors through ONE
  explicit repartition that all four heavy legs (LSH signatures, both
  token-set join sides, the n-gram explode) reuse. Without it,
  per-consumer column pruning specializes each leg's subplan below the
  md5 window and the scan->quality->window prefix recomputes once per
  leg (funnel agg 3.67s -> 2.55s interleaved medians at sf0.1). The
  reuse itself is the contract, so the final adaptive plan must contain
  ReusedExchange nodes, not just the repartition.
"""

from __future__ import annotations

import pytest

from log_agent_spark.operators import decontaminate, dedup, text
from log_agent_spark.operators.curation import q_pipeline_corpus_build

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    # collect() drives THIS DataFrame's QueryExecution so the adaptive
    # plan finalizes; every result here is small at sf0.001
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "fn",
    [
        text.q_repetition_gates,
        decontaminate.q_decontaminate,
        decontaminate.q_contamination_spans,
        decontaminate.q_repeated_spans,
        dedup.q_dedup_minhash_estimate,
    ],
    ids=lambda fn: fn.__name__,
)
def test_rebalanced_scan_has_roundrobin_exchange(spark, fn):
    plan = _final_plan(fn(spark, SF))
    assert "isFinalPlan=true" in plan, plan
    # the input rebalance is an explicit round-robin repartition; AQE
    # never coalesces it away, so it must survive into the final plan
    assert "RoundRobinPartitioning" in plan, (
        f"{fn.__name__}: input rebalance missing from final plan"
    )


@pytest.mark.parametrize(
    "fn",
    [decontaminate.q_corpus_funnel, q_pipeline_corpus_build],
    ids=lambda fn: fn.__name__,
)
def test_stage_flags_shared_exchange_is_reused(spark, fn):
    plan = _final_plan(fn(spark, SF))
    assert "isFinalPlan=true" in plan, plan
    assert "RoundRobinPartitioning" in plan, (
        f"{fn.__name__}: corpus_stage_flags shared repartition missing"
    )
    # the point of the repartition is the REUSE: the heavy legs must hit
    # the same exchange instead of recomputing the window prefix
    assert "ReusedExchange" in plan, (
        f"{fn.__name__}: no ReusedExchange — the shared subtree stopped "
        "being identical across the stage-flag legs"
    )
