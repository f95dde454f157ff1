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


# ---------------------------------------------------------------------------
# Corpus datasheet: the one-page "datasheet for datasets" summary a corpus
# release ships with — size, composition, duplication, quality, and
# eval-contamination rates as (metric, value) rows. Every value is either
# an exact integer cast to double or a ratio of integer aggregates
# (deterministic cross-engine); the quality gate and contamination pass
# reuse the funnel's exact predicates so the datasheet can never disagree
# with the pipeline that enforces them.
# Scale: one scan computes all single-pass metrics (one agg row); the
# dedup rate is one md5-distinct aggregate; contamination is the audited
# broadcast semi-join. Three passes total, all map-side heavy — over a
# REBALANCED corpus: the fixture scans as one partition, which ran the
# md5/tokenize partials and the contamination explode single-task
# (same-session A/B best-of-3 at sf0.1: 3.8s → 1.3s with the rebalance;
# at cluster scale the input is already many partitions and the
# round-robin exchange is a cheap even-out).
# ---------------------------------------------------------------------------
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_agent_spark.operators.decontaminate import (
        EVAL_SOURCE,
        MAX_MEAN_WORD_LEN,
        MIN_TOKENS,
        token_ngrams,
    )

    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ntoks = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    qpred = (ntoks >= MIN_TOKENS) & (
        F.length("text") / ntoks <= MAX_MEAN_WORD_LEN
    )
    base = d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum(ntoks).alias("n_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.sum(qpred.cast("long")).alias("n_quality"),
        F.sum((F.col("source") != EVAL_SOURCE).cast("long")).alias("n_train"),
    )
    eval_ngrams = (
        d.filter(F.col("source") == EVAL_SOURCE)
        .select(F.explode(token_ngrams(F.col("text"))).alias("ngram"))
        .distinct()
    )
    contaminated = (
        d.filter(F.col("source") != EVAL_SOURCE)
        .select("doc_id", F.explode(token_ngrams(F.col("text"))).alias("ngram"))
        .join(F.broadcast(eval_ngrams), "ngram", "left_semi")
        .select("doc_id")
        .distinct()
        .agg(F.count("*").alias("n_contaminated"))
    )
    row = base.crossJoin(F.broadcast(contaminated))
    metrics = [
        ("n_docs", F.col("n_docs").cast("double")),
        ("n_chars", F.col("n_chars").cast("double")),
        ("n_tokens", F.col("n_tokens").cast("double")),
        ("n_sources", F.col("n_sources").cast("double")),
        ("n_langs", F.col("n_langs").cast("double")),
        ("avg_doc_tokens", F.round(F.col("n_tokens") / F.col("n_docs"), 4)),
        (
            "exact_dup_frac",
            F.round(
                (F.col("n_docs") - F.col("n_unique")) / F.col("n_docs"), 4
            ),
        ),
        ("quality_pass_frac", F.round(F.col("n_quality") / F.col("n_docs"), 4)),
        (
            "eval_contaminated_frac",
            F.round(F.col("n_contaminated") / F.col("n_train"), 4),
        ),
    ]
    rows = F.array(
        *[
            F.struct(F.lit(name).alias("metric"), expr.alias("value"))
            for name, expr in metrics
        ]
    )
    return row.select(F.explode(rows).alias("m")).select("m.metric", "m.value")


def _datasheet_oracle() -> str:
    from log_agent_spark.operators.decontaminate import (
        EVAL_SOURCE,
        MAX_MEAN_WORD_LEN,
        MIN_TOKENS,
        _sql_ngrams_n,
        NGRAM_N,
    )

    grams = _sql_ngrams_n(NGRAM_N)
    toks = "list_filter(string_split(text, ' '), t -> t <> '')"
    return f"""
WITH base AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars,
         CAST(SUM(len({toks})) AS BIGINT) AS n_tokens,
         COUNT(DISTINCT source) AS n_sources,
         COUNT(DISTINCT lang) AS n_langs,
         COUNT(DISTINCT md5(text)) AS n_unique,
         CAST(SUM(CASE WHEN len({toks}) >= {MIN_TOKENS}
                        AND length(text) * 1.0 / len({toks})
                            <= {MAX_MEAN_WORD_LEN}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         CAST(SUM(CASE WHEN source <> '{EVAL_SOURCE}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_train
  FROM documents
), cont AS (
  SELECT COUNT(*) AS n_contaminated FROM (
    SELECT DISTINCT t.doc_id
    FROM ({grams.format(where="WHERE source <> '" + EVAL_SOURCE + "'")}) t
    WHERE t.ngram IN (
      SELECT DISTINCT ngram
      FROM ({grams.format(where="WHERE source = '" + EVAL_SOURCE + "'")})
    )
  )
)
SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
UNION ALL SELECT 'n_chars', CAST(n_chars AS DOUBLE) FROM base
UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM base
UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM base
UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM base
UNION ALL SELECT 'avg_doc_tokens', ROUND(n_tokens * 1.0 / n_docs, 4) FROM base
UNION ALL SELECT 'exact_dup_frac',
                 ROUND((n_docs - n_unique) * 1.0 / n_docs, 4) FROM base
UNION ALL SELECT 'quality_pass_frac',
                 ROUND(n_quality * 1.0 / n_docs, 4) FROM base
UNION ALL SELECT 'eval_contaminated_frac',
                 ROUND(n_contaminated * 1.0 / n_train, 4) FROM base CROSS JOIN cont
"""


ORACLE_CORPUS_DATASHEET = _datasheet_oracle()


QUERIES = {
    "pipeline_corpus_build": q_pipeline_corpus_build,
    "corpus_datasheet": q_corpus_datasheet,
}

ORACLES = {
    "pipeline_corpus_build": ORACLE_PIPELINE_CORPUS_BUILD,
    "corpus_datasheet": ORACLE_CORPUS_DATASHEET,
}
