"""Semantic invariants of the dedup tiers (beyond the oracle hash-match)."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_agent_spark.operators import dedup
from log_agent_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return dedup.with_planted_dups(load_table(spark, sf_dir, "documents"))


def test_exact_finds_all_planted(spark, sf_dir):
    out = dedup.exact_duplicates(_docs(spark, sf_dir)).collect()
    # 50 planted exact copies → 50 duplicate groups of exactly 2
    assert len(out) == 50
    assert all(r.n_copies == 2 for r in out)
    assert sorted(r.representative for r in out) == list(range(50))


def test_minhash_identical_texts_identical_sigs(spark, sf_dir):
    sig = dedup.minhash_signatures(_docs(spark, sf_dir))
    pair = sig.filter(F.col("doc_id").isin(7, 1_000_007)).collect()
    sigs = {r.doc_id: list(r.sig) for r in pair}
    assert sigs[7] == sigs[1_000_007]
    assert len(sigs[7]) == dedup.NUM_PERMS


def test_lsh_candidates_cover_exact_dups(spark, sf_dir):
    """An exact copy agrees on every band → the pair MUST be a candidate."""
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(_docs(spark, sf_dir)).collect()
    }
    for i in range(50):
        assert (i, i + 1_000_000) in pairs, f"exact dup pair {i} missed by LSH"


def test_ngram_jaccard_scores(spark, sf_dir):
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 1_000_000 < 20)
    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    for i in range(20):
        assert out[(i, i + 1_000_000)] == 1.0  # identical text
        near = out.get((i, i + 2_000_000))
        assert near is not None and 0.5 < near < 1.0  # truncated copy


def test_simhash_stability_and_width(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    )
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs.unionByName(dup)).collect()}
    assert out[3] == out[9_000_003]
    assert all(0 <= v < (1 << dedup.SIMHASH_BITS) for v in out.values())
