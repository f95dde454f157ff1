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


def test_matryoshka_recall_monotone_and_exact_at_full_dim(spark, sf_dir):
    """Full-dimension 'truncation' must recover the ground truth exactly
    (recall 1.0); shorter prefixes can only lose information, so recall is
    non-increasing as dimensions shrink."""
    from log_agent_spark.operators.similarity import q_ann_matryoshka_recall

    rows = sorted(
        q_ann_matryoshka_recall(spark, sf_dir).collect(),
        key=lambda r: -r.dim,
    )
    assert rows[0].dim == 64 and rows[0].recall_at_k == 1.0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.recall_at_k <= prev.recall_at_k


def test_ivf_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """nprobe=2 must recover at least the recall of nprobe=1 against the
    brute-force ground truth (probing a superset of cells can only add
    candidates)."""
    from log_agent_spark.operators.similarity import (
        q_ann_cosine_topk,
        q_ann_ivf,
        q_ann_ivf_multiprobe,
    )

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    truth = pairs(q_ann_cosine_topk(spark, sf_dir))
    single = pairs(q_ann_ivf(spark, sf_dir))
    multi = pairs(q_ann_ivf_multiprobe(spark, sf_dir))
    assert len(multi & truth) >= len(single & truth), (
        len(multi & truth),
        len(single & truth),
    )


def test_nprobe_recall_curve_is_monotone(spark, sf_dir):
    """Recall must be non-decreasing in nprobe (each setting probes a
    superset of cells) and reach 1.0 when every cell is probed... or at
    least never decrease; the curve rows carry consistent counts."""
    from log_agent_spark.operators.similarity import q_ann_nprobe_recall

    rows = sorted(
        q_ann_nprobe_recall(spark, sf_dir).collect(), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == [1, 2, 3, 4]
    recalls = [r.recall_at_k for r in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:])), recalls
    assert all(0.0 <= r <= 1.0 for r in recalls)
