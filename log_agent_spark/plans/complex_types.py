"""Complex-type and remaining-join relational coverage (SURVEY.md §2.7).

The reference's only non-scalar value is the zip-entry expansion
(`watchdog/handler/kafka.go:209-274` — one archive record → N member
records); these queries exercise the general Spark forms of that shape —
ArrayType columns, lateral explode (1 row → N rows), FULL OUTER join, and
exact interpolated percentiles — all absent from the reference and
provided by Catalyst built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_agent_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Array functions over a derived array column: split the document text into
# a token array, then size / distinct-size / first / last — all JVM-side
# array builtins (no UDF, whole-stage codegen). Scale: embarrassingly
# parallel map; only `text` is read (column pruning).
# ---------------------------------------------------------------------------
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    )


ORACLE_ARRAY_OPS = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       string_split(text, ' ')[1] AS first_token,
       string_split(text, ' ')[-1] AS last_token
FROM documents
"""


# ---------------------------------------------------------------------------
# Lateral explode — the relational generalization of the reference's zip
# explode (1 archive row → N member rows, kafka.go:209-274): per-document
# token multiplicities for a doc_id slice. Scale: explode multiplies rows
# BEFORE the shuffle, so the doc_id filter must (and does) push below it;
# the per-(doc,token) aggregation is map-side-combined.
# ---------------------------------------------------------------------------
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("n_occurrences"))
    )


ORACLE_LATERAL_EXPLODE = """
SELECT doc_id, token, COUNT(*) AS n_occurrences
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 40) t
WHERE token <> ''
GROUP BY doc_id, token
"""


# ---------------------------------------------------------------------------
# FULL OUTER join: per-nation customer vs supplier counts, keeping nations
# that have only one side. Scale: both inputs are pre-aggregated to at most
# |nation| rows BEFORE the join — the full-outer shuffle touches dozens of
# rows regardless of fact size.
# ---------------------------------------------------------------------------
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_rich_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_rich_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_rich_customers", F.lit(0)).alias("n_rich_customers"),
            F.coalesce("n_rich_suppliers", F.lit(0)).alias("n_rich_suppliers"),
        )
    )


ORACLE_JOIN_FULL_OUTER = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_rich_customers, 0) AS n_rich_customers,
       COALESCE(n_rich_suppliers, 0) AS n_rich_suppliers
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_rich_customers
      FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, COUNT(*) AS n_rich_suppliers
      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
USING (nationkey)
"""


# ---------------------------------------------------------------------------
# Exact interpolated percentiles per group (Spark `percentile` ==
# PostgreSQL/DuckDB `quantile_cont` semantics). Scale note: exact
# percentiles need the full value multiset per group — at 100 TB use
# `approx_percentile` (t-digest, mergeable sketch, map-side combined); the
# exact form here doubles as that variant's correctness anchor.
# ---------------------------------------------------------------------------
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("p75_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
    )


ORACLE_AGG_PERCENTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
       ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75_qty,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Python UDTF + LATERAL join (§2.7 "UDAF/UDTF" surface): a user-defined
# table function splitting text into (word, pos) rows, consumed via SQL
# LATERAL — the general form of the reference's one-record→N-records zip
# expansion as a USER extension point. Per-row Python is deliberately the
# slow path (SCALE.md): built-in explode/split (q_array_ops) or mapInPandas
# (ziputil.py) carry the hot path; the UDTF exists for semantics Spark
# can't express — so the input here is capped small.
# ---------------------------------------------------------------------------
def q_text_udtf_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "lang", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.lang, COUNT(*) AS n_words,
               COUNT(DISTINCT s.word) AS n_distinct_words,
               CAST(MAX(s.pos) AS BIGINT) AS max_pos
        FROM udtf_docs d, LATERAL split_words(d.text) s
        GROUP BY d.lang
        """
    )


ORACLE_TEXT_UDTF_WORDS = """
WITH words AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents WHERE doc_id < 50
)
SELECT lang, COUNT(*) AS n_words, COUNT(DISTINCT word) AS n_distinct_words,
       MAX(pos) AS max_pos
FROM words GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Pandas grouped-agg UDAF (§2.7 "UDAF/UDTF" surface, aggregate half): a
# user-defined geometric mean over Arrow-batched numpy — the extension
# point for aggregates Catalyst lacks. Arrow transfer + vectorized numpy,
# never row-at-a-time Python; still the slow path vs exp(avg(ln(x))) in
# built-ins, which is what the oracle uses and what production would ship.
# ---------------------------------------------------------------------------
def q_pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations` turns the
    # (pd.Series -> float) hints into strings, which signature inference
    # rejects
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geomean(v):
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    # Spark disallows mixing pandas and JVM aggregates in one agg, so the
    # row count is a pandas aggregate too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return d.groupBy("lang").agg(
        F.round(geomean(F.col("n_chars")), 4).alias("geomean_chars"),
        n_rows(F.col("n_chars")).alias("n_docs"),
    )


ORACLE_PANDAS_UDAF_GEOMEAN = """
SELECT lang, ROUND(EXP(AVG(LN(CAST(n_chars AS DOUBLE)))), 4)
         AS geomean_chars,
       COUNT(*) AS n_docs
FROM documents WHERE n_chars > 0 GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Recursive CTE (WITH RECURSIVE, Spark 4 UnionLoop execution): iterative
# hierarchy traversal expressed declaratively — the SQL-native form of the
# driver-loop iteration in operators/graph.py. The hierarchy is a synthetic
# ternary tree over doc_ids (parent(d) = floor((d-1)/3)) so the query is
# deterministic on any corpus; output is the per-depth rollup. The SAME SQL
# text runs on Spark and on the DuckDB oracle (ANSI recursive-CTE syntax).
# Scale: each recursion level is one distributed join; Spark materializes
# level N and feeds it to level N+1 — depth is log3(n_docs), so a 10^11-doc
# corpus recurses ~23 levels of broadcast-sized frontiers.
# ---------------------------------------------------------------------------
_RECURSIVE_TREE_SQL = """
WITH RECURSIVE tree(doc_id, depth) AS (
  SELECT doc_id, 0 AS depth FROM documents WHERE doc_id = 0
  UNION ALL
  SELECT d.doc_id, t.depth + 1
  FROM documents d JOIN tree t
    ON CAST(FLOOR((d.doc_id - 1) / 3.0) AS BIGINT) = t.doc_id
  WHERE d.doc_id > 0
)
SELECT depth, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM tree GROUP BY depth
"""


def q_recursive_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy rollup; the same SQL text runs on Spark and DuckDB."""
    from log_agent_spark.sources.tables import register_tables

    register_tables(spark, sf_dir, ["documents"])
    return spark.sql(_RECURSIVE_TREE_SQL)


ORACLE_RECURSIVE_TREE_ROLLUP = _RECURSIVE_TREE_SQL


QUERIES = {
    "array_ops": q_array_ops,
    "text_udtf_words": q_text_udtf_words,
    "pandas_udaf_geomean": q_pandas_udaf_geomean,
    "lateral_explode": q_lateral_explode,
    "join_full_outer": q_join_full_outer,
    "agg_percentiles": q_agg_percentiles,
    "recursive_tree_rollup": q_recursive_tree_rollup,
}

ORACLES = {
    "array_ops": ORACLE_ARRAY_OPS,
    "text_udtf_words": ORACLE_TEXT_UDTF_WORDS,
    "pandas_udaf_geomean": ORACLE_PANDAS_UDAF_GEOMEAN,
    "lateral_explode": ORACLE_LATERAL_EXPLODE,
    "join_full_outer": ORACLE_JOIN_FULL_OUTER,
    "agg_percentiles": ORACLE_AGG_PERCENTILES,
    "recursive_tree_rollup": ORACLE_RECURSIVE_TREE_ROLLUP,
}
