"""curation.build_corpus: the user-facing pipeline must agree exactly with
the oracled funnel report built from the same plan, never fabricate or
leak fixture-planted documents by default, produce a disjoint and complete
split, and be write-stable."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_agent_spark.operators.curation import build_corpus
from log_agent_spark.operators.decontaminate import q_corpus_funnel
from log_agent_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_build_matches_funnel_final_stage(spark):
    # the funnel runs on the planted fixture corpus; compare like-for-like
    clean = build_corpus(
        load_table(spark, SF, "documents"), plant_fixture_dups=True
    )
    n_docs, n_chars = clean.agg(
        F.count("*"), F.sum(F.length("text"))
    ).first()
    funnel = {r.stage: r for r in q_corpus_funnel(spark, SF).collect()}
    assert n_docs == funnel["decontaminated"].n_docs
    assert n_chars == funnel["decontaminated"].n_chars


def test_default_build_never_fabricates_docs(spark):
    """plant_fixture_dups defaults OFF: every shipped doc_id must exist in
    the input — no synthetic +1e6/+2e6 fixture rows in a real build."""
    docs = load_table(spark, SF, "documents")
    clean = build_corpus(docs)
    input_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    out_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert out_ids, "empty corpus"
    assert out_ids <= input_ids, sorted(out_ids - input_ids)[:5]


def test_split_is_disjoint_complete_and_deterministic(spark):
    clean = build_corpus(load_table(spark, SF, "documents"))
    rows = clean.collect()
    assert rows
    splits = {r.doc_id: r.split for r in rows}
    assert set(splits.values()) <= {"train", "val", "test"}
    # one split per doc (disjoint + complete by construction of the rows)
    assert len(splits) == len(rows)
    # deterministic: a second independent build assigns identical splits
    again = {
        r.doc_id: r.split
        for r in build_corpus(load_table(spark, SF, "documents")).collect()
    }
    assert again == splits


def test_partitioned_write_roundtrip(spark, tmp_path):
    clean = build_corpus(load_table(spark, SF, "documents"))
    out = str(tmp_path / "corpus")
    clean.write.mode("overwrite").partitionBy("split").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == clean.count()
    assert set(back.columns) == {"doc_id", "text", "split"}
