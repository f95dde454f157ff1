"""Semantic tests for the round-4 query additions — the oracle gate proves
cross-engine equality; these pin what the operators MEAN on constructed
micro-data (the property a matching-but-wrong formula on both engines
would still fail)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# media perceptual-hash near-dup
# ---------------------------------------------------------------------------
def _hashes(spark, payloads):
    from log_agent_spark.operators.multimodal import phash_table
    from log_agent_spark.scratch import _persistent_ids, _release_new

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id long, p string"
    )
    before = _persistent_ids(spark)
    try:
        return {r.media_id: r.phash for r in phash_table(df, "id", "p").collect()}
    finally:
        _release_new(spark, before)


def test_phash_identical_payloads_collide_and_local_edit_stays_near(spark):
    base = ("the quick keen eel sees deep green trees " * 8).strip()
    # one edit confined to the tail blocks: most of the 16 block statistics
    # are untouched, so the hash moves by only a few bits
    edited = base[:-24] + "zzzzzzzzzzzzzzzzzzzzzzzz"
    different = "0123456789 " * 30
    h = _hashes(spark, [base, base, edited, different])
    assert h[0] == h[1]  # identical bytes → identical hash
    ham_edit = bin(h[0] ^ h[2]).count("1")
    ham_diff = bin(h[0] ^ h[3]).count("1")
    assert ham_edit <= 4, f"local edit moved {ham_edit} bits"
    assert ham_diff > ham_edit, "unrelated payload not farther than an edit"


def test_phash_neardup_query_reports_exact_dups_at_hamming_zero(spark):
    import __spark_entry__ as entry

    pairs = entry.queries()["media_phash_neardup"](spark, SF).collect()
    assert pairs, "fixture corpus should contain at least one near-dup pair"
    assert all(0 <= r.hamming <= 3 for r in pairs)


# ---------------------------------------------------------------------------
# character entropy
# ---------------------------------------------------------------------------
def test_char_entropy_flags_degenerate_strings(spark):
    import math

    from log_agent_spark.operators import text as text_ops

    # drive the same pipeline over a controlled frame by monkey-free reuse:
    # entropy of 'aaaa' is 0 bits; of 'abcd' is exactly 2 bits
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd")], "doc_id long, text string"
    )
    chars = df.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i")
    ).join(df, "doc_id").select("doc_id", F.expr("substring(text, i, 1)").alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    ent = {
        r.doc_id: r.e
        for r in counts.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum((F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n"))), 4
            ).alias("e")
        )
        .collect()
    }
    assert ent[1] == 0.0
    assert math.isclose(ent[2], 2.0)

    # and the fixture-corpus query marks nothing suspect in normal prose
    import __spark_entry__ as entry

    rows = entry.queries()["text_char_entropy"](spark, SF).collect()
    assert rows
    suspects = [r for r in rows if r.is_suspect]
    assert len(suspects) < len(rows)  # prose corpus is mostly in-band


# ---------------------------------------------------------------------------
# calibration / fertility / cluster sizes: partition + consistency laws
# ---------------------------------------------------------------------------
def test_quality_calibration_bins_partition_the_corpus(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    bins = qs["text_quality_calibration"](spark, SF).collect()
    n_docs = sum(r.n_docs for r in bins)
    corpus = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_docs == corpus
    for r in bins:
        assert 0 <= r.score_bin <= 9
        assert 0.0 <= r.gold_pass_rate <= 1.0
        assert r.n_gold_pass <= r.n_docs


def test_langid_fertility_totals_match_token_stats(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    fert = qs["text_langid_fertility"](spark, SF).collect()
    total_tokens = sum(r.total_tokens for r in fert)
    total_docs = sum(r.n_docs for r in fert)
    agg = (
        qs["text_token_stats"](spark, SF)
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("d"))
        .first()
    )
    assert total_tokens == agg.t
    assert total_docs == agg.d


def test_dedup_cluster_sizes_consistent_with_exact_dedup(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    hist = qs["dedup_cluster_sizes"](spark, SF).collect()
    # redundant docs from the histogram == total copies minus representatives
    redundant = sum(r.redundant_docs for r in hist)
    dup_groups = qs["dedup_exact"](spark, SF).collect()
    assert redundant == sum(g.n_copies - 1 for g in dup_groups)
    for r in hist:
        assert r.n_docs == r.cluster_size * r.n_clusters
