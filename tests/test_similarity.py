"""Recall of the approximate ANN strategies against the exact brute-force
ranking at sf0.01 — the quality half of the speed/memory tradeoffs
(correctness of each variant vs its own DuckDB oracle is the driver's t2)."""

from __future__ import annotations

import pytest

from log_agent_spark.operators.similarity import (
    TOP_K,
    q_ann_cosine_topk,
    q_ann_int8_topk,
    q_ann_lsh_bucketed,
)


# Pin the scale factor: recall is a property of the corpus, and sf0.01 is
# the driver's correctness scale (the default test fixture is sf0.001,
# where 500 vectors over 64 buckets makes the measurement noisy).
SF_DIR = "/root/testdata/sf0.01"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


@pytest.fixture(scope="module")
def exact(spark):
    return _topk_sets(q_ann_cosine_topk(spark, SF_DIR))


def _recall(approx, exact):
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    return hits / (len(exact) * TOP_K)


def test_int8_recall_near_perfect(spark, exact):
    """8-bit quantization perturbs cosines by ~1e-2 relative — top-5 sets
    should survive nearly intact."""
    approx = _topk_sets(q_ann_int8_topk(spark, SF_DIR))
    assert _recall(approx, exact) >= 0.9, approx


def test_lsh_recall_above_floor(spark, exact):
    """Sign-LSH with hamming-1 multi-probe (7 of 64 buckets scored) must
    find a usable fraction of true neighbors — single-probe measured 0.08
    here, multi-probe 0.4."""
    approx = _topk_sets(q_ann_lsh_bucketed(spark, SF_DIR))
    assert _recall(approx, exact) >= 0.3, approx
