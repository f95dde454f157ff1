"""Skew mitigation: salting for hot keys (SURVEY.md §4 / task scale notes).

Two patterns that stay exact while breaking hot keys across reducers:

- ``salted_count_distinct`` — per-key exact distinct counts where one key
  holds most rows. Salting by ``hash(distinct_col) % b`` makes the per-
  bucket value sets DISJOINT, so bucket distinct-counts sum to the exact
  total: phase 1 aggregates (key, salt) — b-way fan-out of the hot key —
  and phase 2 merges b small rows per key. (Plain sum/count aggs don't
  need this: hash-aggregate's map-side partial combine already absorbs
  key skew before the shuffle.)
- ``salted_join`` — replicate the small side to every salt bucket and
  scatter the big side's hot keys across (key, salt) partitions. AQE's
  skew-join split (enabled in session.py) handles moderate skew at
  runtime; explicit salting is for the pathological key that exceeds a
  single executor even after AQE splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from log_agent_spark.sources.tables import load_table

SALT_BUCKETS = 16


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    buckets: int = SALT_BUCKETS,
    out_col: str = "n_distinct",
) -> DataFrame:
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets))
    phase1 = (
        df.select(*keys, F.col(distinct_col), salt.alias("_salt"))
        .groupBy(*keys, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(out_col))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    buckets: int = SALT_BUCKETS,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Equi-join with the right (small) side replicated over ``buckets`` salts.

    ``salt_expr`` spreads left rows across buckets; default hashes all left
    columns (any per-row spread is correct — the salt only routes rows).
    """
    if salt_expr is None:
        salt_expr = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets))
    l = left.withColumn("_salt", salt_expr.cast("long"))
    r = right.select(
        "*",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(buckets - 1).cast("long"))).alias(
            "_salt"
        ),
    )
    return l.join(r, on=keys + ["_salt"]).drop("_salt")


def q_skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the salted two-phase plan — exact,
    and the hot event type fans out over 16 reducers instead of one."""
    e = load_table(spark, sf_dir, "events")
    return salted_count_distinct(e, ["event_type"], "user_id", out_col="n_users")


ORACLE_SKEW_SALTED_DISTINCT = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-tiny-dim join on a 5-value (maximally skewed) key via the
    salt-replicated join: the dim is exploded over 16 salts so each hot key
    spreads across 16 reducers instead of hot-spotting one. Result is
    verified identical to the plain join."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("double"))
    )
    joined = salted_join(e, dim, ["event_type"])
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum((F.col("value") * F.col("weight")).cast("decimal(18,4)")), 2
        )
        .cast("double")
        .alias("weighted_sum"),
    )


ORACLE_SKEW_SALTED_JOIN = """
WITH dim AS (
  SELECT DISTINCT event_type,
         CAST(length(event_type) AS DOUBLE) AS weight
  FROM events
)
SELECT e.event_type, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(e.value * d.weight AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS weighted_sum
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
"""


QUERIES = {
    "skew_salted_distinct": q_skew_salted_distinct,
    "skew_salted_join": q_skew_salted_join,
}
ORACLES = {
    "skew_salted_distinct": ORACLE_SKEW_SALTED_DISTINCT,
    "skew_salted_join": ORACLE_SKEW_SALTED_JOIN,
}
