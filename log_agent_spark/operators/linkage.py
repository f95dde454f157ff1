"""Entity-resolution blocking: the plan report an ER/record-linkage run
computes before it compares anything.

At 100 TB, pairwise record comparison is O(n²) and never runs raw —
every production linkage system (Fellegi-Sunter deduplication, splink,
dedupe.io) first partitions records into *blocks* on cheap keys and only
compares within blocks. Choosing the blocking key IS the scale decision:
too coarse and one block still holds a quadratic hot spot, too fine and
true matches land in different blocks. This module computes the report
that drives that choice — per candidate strategy, the exact number of
within-block comparisons and the reduction versus the naive all-pairs
count, plus the max block (the straggler task a 1000-executor run would
wait on).

Scale shape: one groupBy per strategy (map-side combinable count), then a
k-row aggregate over the per-block counts — nothing all-pairs is ever
materialized; the quadratic quantity is *computed arithmetically* from
block sizes (sum over blocks of n·(n−1) ordered pairs). Per-block counts
are cast to DECIMAL(38,0) before the self-product: n·(n−1) overflows
BIGINT for any block over ~3e9 rows, and Spark's non-ANSI mode would wrap
silently where DuckDB widens (the wrong-answer-vs-crash divergence class).

Reference parity: the reference has no linkage layer (closest analog is
its per-file identity keying, watchdog/watchdog.go:314-326); this is part
of the training-pipeline extension surface SURVEY.md §2 lists alongside
dedup — blocking is to structured-record ER what banded LSH is to
document near-dup (operators/dedup.py), and the two reports deliberately
mirror each other.

Cross-engine float discipline: the only float column is the reduction
ratio — a single IEEE division of two exact integers (both < 2^53 at any
tested SF), rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_agent_spark.sources.tables import load_table

# Candidate blocking strategies over the customer table, coarse → fine.
# (label, spark block-key columns, duckdb block-key sql)
_STRATEGIES = [
    ("nation", ["c_nationkey"], "c_nationkey"),
    ("mktsegment", ["c_mktsegment"], "c_mktsegment"),
    ("nation_x_segment", ["c_nationkey", "c_mktsegment"],
     "c_nationkey, c_mktsegment"),
]


def block_profile(df: DataFrame, key_cols: list[str], label: str) -> DataFrame:
    """One strategy's row: block count, max block, exact comparison count.

    ``candidate_pairs`` counts ORDERED pairs (n·(n−1) per block) so the
    quantity stays a pure integer on both engines — no halving division.
    """
    per_block = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count("*").alias("cnt")
    )
    d = F.col("cnt").cast("decimal(38,0)")
    stats = per_block.agg(
        F.sum("cnt").cast("bigint").alias("n_records"),
        F.count("*").cast("bigint").alias("n_blocks"),
        F.max("cnt").cast("bigint").alias("max_block"),
        F.sum(d * (d - F.lit(1))).cast("bigint").alias("candidate_pairs"),
    )
    naive = (
        F.col("n_records").cast("double")
        * (F.col("n_records") - F.lit(1)).cast("double")
    )
    return stats.select(
        F.lit(label).alias("strategy"),
        "n_records",
        "n_blocks",
        "max_block",
        "candidate_pairs",
        # try_divide: a 1-record table makes naive = 0; DuckDB yields NULL
        # on division by zero where Spark's ANSI default would crash.
        F.round(
            F.try_divide(F.col("candidate_pairs").cast("double"), naive), 6
        ).alias("reduction_ratio"),
    )


def q_er_blocking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-strategy comparison for customer-record linkage: for each
    candidate block key, the exact within-block comparison count, the max
    block (straggler bound), and the reduction vs naive all-pairs."""
    c = load_table(spark, sf_dir, "customer")
    out = None
    for label, cols, _sql in _STRATEGIES:
        row = block_profile(c, cols, label)
        out = row if out is None else out.unionByName(row)
    return out


def _strategy_sql(label: str, key_sql: str) -> str:
    return f"""
  SELECT '{label}' AS strategy,
         CAST(SUM(cnt) AS BIGINT) AS n_records,
         CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(MAX(cnt) AS BIGINT) AS max_block,
         CAST(SUM(CAST(cnt AS HUGEINT) * (cnt - 1)) AS BIGINT)
           AS candidate_pairs,
         ROUND(CAST(SUM(CAST(cnt AS HUGEINT) * (cnt - 1)) AS DOUBLE)
               / (CAST(SUM(cnt) AS DOUBLE) * (SUM(cnt) - 1)), 6)
           AS reduction_ratio
  FROM (SELECT {key_sql}, COUNT(*) AS cnt FROM customer GROUP BY ALL)"""


ORACLE_ER_BLOCKING_PLAN = "\nUNION ALL\n".join(
    _strategy_sql(label, key_sql) for label, _cols, key_sql in _STRATEGIES
)


QUERIES = {
    "er_blocking_plan": q_er_blocking_plan,
}
ORACLES = {
    "er_blocking_plan": ORACLE_ER_BLOCKING_PLAN,
}
