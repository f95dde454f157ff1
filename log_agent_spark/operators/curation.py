"""User-facing corpus-curation pipeline: one call from raw documents to a
training-ready corpus with split assignments.

The reference is a collection agent, not a curation system (SURVEY.md §0);
this module is the north-star extension that makes the collected corpus
TRAINABLE: it composes the already-oracled stages — quality gate, exact
dedup, LSH near-dedup, eval-set decontamination
(``decontaminate.corpus_stage_flags``) — and attaches the deterministic
80/10/10 content-hash split (``sampling.split_expr``), so a user gets

    clean = build_corpus(spark.read.parquet(...))
    clean.write.partitionBy("split").parquet(...)

with exactly the semantics the funnel report (``pipeline_corpus_funnel``)
audits. The two share one plan (``corpus_stage_flags``), so the report can
never drift from what the builder ships.

Scale: the flags plan is the audited single-pass shape (one lineage, two
bounded exclusion-set side tables); the split is a map-side md5 expression
(no shuffle, reproducible on any cluster layout); the per-split report is
one 3-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_agent_spark.operators.decontaminate import corpus_stage_flags, funnel_cte
from log_agent_spark.plans.sampling import split_expr, split_sql
from log_agent_spark.sources.tables import load_table


def build_corpus(docs: DataFrame, plant_fixture_dups: bool = False) -> DataFrame:
    """Raw documents table → (doc_id, text, split): the fully-curated
    corpus (quality-gated, exact- and near-deduped, decontaminated) with
    the deterministic train/val/test assignment attached.

    ``plant_fixture_dups`` stays False for real corpora — it injects the
    test fixture's synthetic duplicates and exists only so the fixture
    queries/tests can exercise the dedup stages against known dups."""
    flags = corpus_stage_flags(docs, plant_fixture_dups=plant_fixture_dups)
    return flags.filter(F.col("s5")).select(
        "doc_id", "text", split_expr(F.col("doc_id")).alias("split")
    )


def q_pipeline_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split (n_docs, n_chars) of the final curated corpus — the
    builder's shipping manifest, cross-checked against the one-shot SQL
    pipeline. Runs on the planted fixture corpus (like the funnel) so the
    dedup stages have known duplicates to remove."""
    clean = build_corpus(
        load_table(spark, sf_dir, "documents"), plant_fixture_dups=True
    )
    return clean.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
    )


ORACLE_PIPELINE_CORPUS_BUILD = f"""{funnel_cte()}
SELECT {split_sql('doc_id')} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars
FROM clean
GROUP BY split
"""


QUERIES = {
    "pipeline_corpus_build": q_pipeline_corpus_build,
}

ORACLES = {
    "pipeline_corpus_build": ORACLE_PIPELINE_CORPUS_BUILD,
}
