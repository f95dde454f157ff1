"""Decontamination + snapshot-diff: plan shape (eval side broadcasts, no
Python in the pipeline) and semantic invariants. Values are oracled."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_agent_spark.operators import decontaminate

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_eval_ngrams_broadcast_semi_join(spark):
    plan = _plan(decontaminate.q_decontaminate(spark, SF))
    assert "LeftSemi" in plan, plan
    assert "BroadcastExchange" in plan, plan
    # all-JVM pipeline: no Python evaluation nodes
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_overlap_ratio_bounded(spark):
    rows = decontaminate.q_decontaminate(spark, SF).collect()
    for r in rows:
        assert 0 < r.hit_ngrams <= r.train_ngrams
        assert 0 < r.overlap_ratio <= 1.0


def test_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b c",)], "text string").select(
        F.size(decontaminate.token_ngrams(F.col("text"))).alias("n")
    )
    assert df.collect()[0].n == 0


def test_snapshot_diff_partitions_docids(spark):
    rows = {r.status: r for r in decontaminate.q_snapshot_diff(spark, SF).collect()}
    # every fixture doc lands in exactly one bucket of the v1/v2 universe
    assert set(rows) <= {"added", "removed", "changed", "unchanged"}
    if "added" in rows:  # added docs are v2-only: doc_id % 7 == 0, % 5 != 0
        assert rows["added"].min_doc % 7 == 0
    if "removed" in rows:  # removed docs are v1-only: doc_id % 5 == 0
        assert rows["removed"].min_doc % 5 == 0


def test_corpus_funnel_monotone_and_discriminating(spark):
    """Funnel invariants: stage populations only shrink, every gate before
    decontamination actually removes something on the planted fixture (the
    50 exact copies die at exact_dedup, the truncated copies at near_dedup),
    and chars shrink with docs."""
    rows = sorted(
        decontaminate.q_corpus_funnel(spark, SF).collect(),
        key=lambda r: r.stage_ord,
    )
    assert [r.stage for r in rows] == [
        "raw", "quality", "exact_dedup", "near_dedup", "decontaminated",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_docs <= prev.n_docs
        assert cur.n_chars <= prev.n_chars
    by = {r.stage: r for r in rows}
    assert by["exact_dedup"].n_docs < by["quality"].n_docs
    assert by["near_dedup"].n_docs < by["exact_dedup"].n_docs


def test_psi_drift_invariants(spark):
    """PSI sanity: all bins present, smoothed p/q sum to 1, every per-bin
    contribution is non-negative ((p-q) and ln(p/q) share sign), and the
    repeated total equals the sum of contributions."""
    rows = sorted(
        decontaminate.q_corpus_drift_psi(spark, SF).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in rows] == list(range(decontaminate._PSI_BINS))
    assert abs(sum(r.p for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.q for r in rows) - 1.0) < 1e-4
    assert all(r.psi_contrib >= 0 for r in rows)
    totals = {r.psi_total for r in rows}
    assert len(totals) == 1
    assert abs(totals.pop() - sum(r.psi_contrib for r in rows)) < 1e-4


def test_contamination_spans_consistent_with_overlap(spark):
    """Span analysis must flag exactly the docs the binary 8-gram test
    flags; every span is at least one full n-gram (8 tokens); island
    count never exceeds matched-position count."""
    overlap_docs = {
        r.doc_id for r in decontaminate.q_decontaminate(spark, SF).collect()
    }
    rows = decontaminate.q_contamination_spans(spark, SF).collect()
    assert {r.doc_id for r in rows} == overlap_docs
    for r in rows:
        assert r.longest_span_tokens >= decontaminate.NGRAM_N
        assert 1 <= r.n_islands <= r.n_matched_ngrams


def test_ngram_novelty_first_doc_and_conservation(spark):
    """Doc 0 (nothing earlier) is 100% novel; the novel counts sum to the
    corpus's distinct-n-gram total (each n-gram is first exactly once);
    ratios live in (0, 1]."""
    rows = decontaminate.q_ngram_novelty(spark, SF).collect()
    by = {r.doc_id: r for r in rows}
    first_doc = min(by)
    assert by[first_doc].novelty_ratio == 1.0
    total_novel = sum(r.n_novel for r in rows)
    from pyspark.sql import functions as F
    from log_agent_spark.sources.tables import load_table

    n_distinct = (
        load_table(spark, SF, "documents")
        .select(F.explode(decontaminate.token_ngrams(F.col("text"))).alias("g"))
        .distinct()
        .count()
    )
    assert total_novel == n_distinct
    # a doc whose every n-gram already appeared earlier is legitimately
    # 0% novel (that's the mirror-detection signal)
    assert all(0 <= r.novelty_ratio <= 1.0 for r in rows)
