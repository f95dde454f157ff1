"""Semantic tripwires for the r10 flatten/rebalance reworks — laws the
flattened forms must satisfy independently of the DuckDB oracle:

- ann_nprobe_recall: candidate sets NEST in nprobe (rn<=n is monotone),
  so recall@k is non-decreasing in nprobe, and the flattened single-plan
  form must equal a literal per-setting reference loop.
- decontam_ngram_sweep: a doc sharing a k-gram shares every shorter
  n-gram of it, so the contaminated fraction is non-increasing in n; and
  token_ngrams with a Column n must equal the literal-n form (the
  flatten's correctness hinges on that equivalence).
- text_ngram_novelty: every distinct n-gram has exactly ONE first
  sighting, so sum(n_novel) == count(distinct grams), and each doc's
  n_novel <= n_distinct_ngrams.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_nprobe_recall_monotone_and_equal_to_per_setting_loop(spark):
    from log_agent_spark.operators import similarity as sim

    rows = {
        r.nprobe: (r.n_recovered, r.recall_at_k)
        for r in sim.q_ann_nprobe_recall(spark, SF).collect()
    }
    assert sorted(rows) == sim.NPROBE_CURVE
    recs = [rows[n][0] for n in sim.NPROBE_CURVE]
    assert recs == sorted(recs), f"recall not monotone in nprobe: {recs}"

    # reference: the literal pre-flatten per-setting computation
    emb = (
        sim.load_table(spark, SF, "embeddings")
        .select("vec_id", sim.as_double(F.col("embedding")).alias("emb"))
    )
    centroids = emb.filter(F.col("vec_id") < sim.N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    truth = sim.q_ann_cosine_topk(spark, SF).select("query_id", "neighbor_id")
    candidates = sim.ivf_assign(emb, centroids).filter(
        F.col("vec_id") >= sim.N_QUERIES
    )
    qemb = emb.filter(F.col("vec_id") < sim.N_QUERIES)
    for n in sim.NPROBE_CURVE:
        probes = sim.ivf_assign(qemb, centroids, nprobe=n).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            "cell",
        )
        topk = sim._cell_topk(probes, candidates).select(
            "query_id", "neighbor_id"
        )
        ref = truth.join(topk, ["query_id", "neighbor_id"], "left_semi").count()
        assert rows[n][0] == ref, f"nprobe={n}: flatten {rows[n][0]} != per-setting {ref}"


def test_token_ngrams_column_n_equals_literal_n(spark):
    from log_agent_spark.operators.decontaminate import NGRAM_SWEEP, token_ngrams
    from log_agent_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents").select("doc_id", "text").limit(50)
    for n in NGRAM_SWEEP:
        diff = (
            d.select(
                "doc_id",
                token_ngrams(F.col("text"), n).alias("lit_form"),
                token_ngrams(F.col("text"), F.lit(n)).alias("col_form"),
            )
            .filter(F.col("lit_form") != F.col("col_form"))
            .count()
        )
        assert diff == 0, f"n={n}: column-n form diverges from literal-n"


def test_decontam_sweep_monotone_nonincreasing(spark):
    from log_agent_spark.operators import decontaminate as dec

    rows = {
        r.ngram_n: r.n_contaminated
        for r in dec.q_decontam_ngram_sweep(spark, SF).collect()
    }
    assert sorted(rows) == dec.NGRAM_SWEEP
    # sharing a k-gram implies sharing its contained shorter n-grams, so
    # larger n can only flag a subset of the docs smaller n flags
    counts = [rows[n] for n in dec.NGRAM_SWEEP]
    assert counts == sorted(counts, reverse=True), counts


def test_ngram_novelty_first_sightings_conserved(spark):
    from log_agent_spark.operators import decontaminate as dec
    from log_agent_spark.sources.tables import load_table

    rows = dec.q_ngram_novelty(spark, SF).collect()
    assert all(0 <= r.n_novel <= r.n_distinct_ngrams for r in rows)
    total_novel = sum(r.n_novel for r in rows)
    d = load_table(spark, SF, "documents")
    n_grams = (
        d.select(F.explode(dec.token_ngrams(F.col("text"))).alias("g"))
        .distinct()
        .count()
    )
    # one first sighting per distinct gram, no more, no fewer
    assert total_novel == n_grams, (total_novel, n_grams)
