"""Accuracy invariants for the first-principles sketches (count-min, HLL,
KMV, Bloom) and the PQ/ADC quantizer. The oracle gate already proves both
engines compute the SAME numbers; these tests prove the numbers are GOOD —
estimator error inside theory bounds, and the one-sided-error structures
(count-min overcount, Bloom no-false-negatives) hold exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from log_agent_spark.operators.dedup import (
    PLANTED_DUPS_SQL,  # noqa: F401  (documents the fixture contract)
    q_dedup_bloom_prefilter,
    with_planted_dups,
)
from log_agent_spark.operators.graph import q_graph_triangle_count
from log_agent_spark.operators.similarity import N_QUERIES, TOP_K, q_ann_pq_adc
from log_agent_spark.plans.events import (
    q_countmin_heavyhitters,
    q_hll_report,
    q_kmv_set_ops,
)
from log_agent_spark.sources.tables import load_table


def test_countmin_overcount_only(spark, sf_dir):
    rows = q_countmin_heavyhitters(spark, sf_dir).collect()
    n_keys = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert len(rows) == min(20, n_keys)
    for r in rows:
        # count-min's structural guarantee: it never undercounts.
        assert r.est_n >= r.exact_n
        assert r.overcount == r.est_n - r.exact_n
    if n_keys > 64:
        # more keys than buckets per row → collisions guaranteed somewhere
        assert any(r.overcount > 0 for r in rows)


def test_hll_error_within_bound(spark, sf_dir):
    rows = q_hll_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # m=64 → theoretical rsd ≈ 1.04/sqrt(64) ≈ 0.13; allow 3σ.
        assert abs(r.rel_err) <= 0.39, (r.event_type, r.rel_err)
        assert r.hll_est > 0 and 0 <= r.v_zero <= 64


def test_kmv_error_within_bound(spark, sf_dir):
    rows = {r.set_name: r for r in q_kmv_set_ops(spark, sf_dir).collect()}
    assert set(rows) == {"click", "view", "union", "intersect"}
    for name in ("click", "view", "union"):
        # k=32 → rsd ≈ 1/sqrt(k-2) ≈ 0.18; allow 3σ. Sets smaller than k
        # are exact by the KMV degenerate rule (θ=1), so 0 error.
        if rows[name].n_exact < 32:
            assert rows[name].rel_err == 0.0, (name, rows[name].rel_err)
        else:
            assert abs(rows[name].rel_err) <= 0.55, (name, rows[name].rel_err)
    # union can never be smaller than either input set's estimate
    assert rows["union"].kmv_est >= max(rows["click"].kmv_est, rows["view"].kmv_est) * 0.999
    # inclusion-exclusion intersection: bounded by the smaller input
    assert rows["intersect"].kmv_est <= min(rows["click"].kmv_est, rows["view"].kmv_est) * 1.001


def test_bloom_no_false_negatives(spark, sf_dir):
    reported = {r.doc_id: r.true_dup for r in q_dedup_bloom_prefilter(spark, sf_dir).collect()}
    corpus = with_planted_dups(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.md5("text").alias("h")
    )
    prior = corpus.filter(F.col("doc_id") < 250).select("h").distinct()
    true_dups = {
        r.doc_id
        for r in corpus.filter(F.col("doc_id") >= 250).join(prior, "h").collect()
    }
    # Bloom structural guarantee: every true duplicate passes the filter.
    assert true_dups, "fixture must plant dups into the prior slice"
    for d in true_dups:
        assert reported.get(d) is True, f"false negative for doc {d}"
    # and everything reported true is actually a dup
    assert {d for d, t in reported.items() if t} == true_dups


def test_triangle_corner_counts_consistent(spark, sf_dir):
    rows = q_graph_triangle_count(spark, sf_dir).collect()
    assert rows
    total_corners = sum(r.tri_cnt for r in rows)
    # every triangle contributes exactly 3 corners
    assert total_corners % 3 == 0 and total_corners > 0


def test_triangle_count_bigint_path_parity(spark, sf_dir, tmp_path):
    """Keys past int32 must take the bigint path and return the SAME
    triangles (shifted), not abort: TPC-H partkeys exceed int32 around
    sf ≈ 10k — the 100 TB regime — so the int32 fast path is a measured
    optimization for small keys, never a scale ceiling. Shifting every
    partkey by a constant is a graph isomorphism, so per-node triangle
    counts must match the unshifted run exactly."""
    shift = 3_000_000_000  # > 2^31: forces the bigint plan
    shifted_dir = str(tmp_path / "sf_shifted")
    load_table(spark, sf_dir, "lineitem").withColumn(
        "l_partkey", F.col("l_partkey") + F.lit(shift)
    ).write.parquet(f"{shifted_dir}/lineitem.parquet")
    base = {
        r.partkey + shift: r.tri_cnt
        for r in q_graph_triangle_count(spark, sf_dir).collect()
    }
    big = {
        r.partkey: r.tri_cnt
        for r in q_graph_triangle_count(spark, shifted_dir).collect()
    }
    assert base and big == base


def test_pq_adc_recall_floor(spark, sf_dir):
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    cands = sorted(v for v in emb if v >= N_QUERIES)
    exact = set()
    for q in range(N_QUERIES):
        d2 = sorted(
            (float(np.sum((emb[q] - emb[c]) ** 2)), c) for c in cands
        )[:TOP_K]
        exact |= {(q, c) for _, c in d2}
    pq = {
        (r.query_id, r.neighbor_id)
        for r in q_ann_pq_adc(spark, sf_dir).collect()
    }
    recall = len(pq & exact) / len(exact)
    # 4x16 codebook from 16 samples is deliberately crude; the structural
    # floor still separates it decisively from random (5/490 ≈ 0.01).
    assert recall >= 0.2, recall
