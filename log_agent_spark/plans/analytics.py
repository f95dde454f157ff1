"""Log-analytics idioms over the events/documents fixtures (SURVEY.md §2.7
extensions): gaps-and-islands, retention cohorts, ranking-function variants,
and edit-distance near-dup — the standing-query shapes a log warehouse runs
on the reference's ingested `logfile`/event tables once they are relational
(the reference itself has no query layer; SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from log_agent_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Gaps-and-islands: maximal runs of consecutive ACTIVE DAYS per user, via
# the date-minus-row_number trick (consecutive days share an island key).
# Scale: one shuffle to dedup (user, day), one window partitioned by user —
# both keyed on user_id, so AQE coalesces them onto one exchange; no
# self-join (the naive formulation) anywhere.
# ---------------------------------------------------------------------------
def q_events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island_key", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        islands.groupBy("user_id", "island_key")
        .agg(
            F.count("*").alias("n_days"),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("start_day"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("end_day"),
        )
        .select("user_id", "n_days", "start_day", "end_day")
    )


ORACLE_EVENTS_GAPS_ISLANDS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), keyed AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS island_key
  FROM days
)
SELECT user_id, COUNT(*) AS n_days,
       strftime(MIN(day), '%Y-%m-%d') AS start_day,
       strftime(MAX(day), '%Y-%m-%d') AS end_day
FROM keyed
GROUP BY user_id, island_key
"""


# ---------------------------------------------------------------------------
# Retention cohort matrix: users grouped by first-activity week; for each
# (cohort_week, weeks_since) the count of still-active users. Scale: the
# first-seen table is |users| rows → broadcast back onto the fact; one
# aggregation shuffle on a tiny composite key.
# ---------------------------------------------------------------------------
def q_events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    first_seen = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(F.broadcast(first_seen), "user_id")
        .withColumn(
            "weeks_since", F.datediff(F.col("week"), F.col("cohort_week")) / 7
        )
        .groupBy(
            F.unix_millis("cohort_week").alias("cohort_week_ms"),
            F.col("weeks_since").cast("int").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


ORACLE_EVENTS_RETENTION_COHORT = """
WITH weekly AS (
  SELECT user_id, date_trunc('week', ts) AS week FROM events
), first_seen AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY user_id
)
SELECT CAST(epoch_ms(cohort_week) AS BIGINT) AS cohort_week_ms,
       CAST(date_diff('day', cohort_week, week) / 7 AS INTEGER) AS weeks_since,
       COUNT(DISTINCT weekly.user_id) AS n_active_users
FROM weekly JOIN first_seen ON weekly.user_id = first_seen.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Ranking-function variants in one window pass: dense_rank / ntile /
# percent_rank / cume_dist over customer balance per nation. Scale: all
# four functions share ONE sort within one Window operator — a single
# shuffle on c_nationkey.
# ---------------------------------------------------------------------------
def q_window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.dense_rank().over(w).alias("balance_dense_rank"),
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("balance_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("balance_cume_dist"),
    )


ORACLE_WINDOW_RANK_VARIANTS = """
SELECT c_custkey, c_nationkey,
       DENSE_RANK()   OVER w AS balance_dense_rank,
       NTILE(4)       OVER w AS balance_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS balance_pct_rank,
       ROUND(CUME_DIST()    OVER w, 6) AS balance_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""


# ---------------------------------------------------------------------------
# Edit-distance near-dup: document pairs in the same language whose 40-char
# prefixes are within Levenshtein distance 24. Scale: the same-lang equi-key
# bounds the pair blow-up (block join on lang); at 100 TB the block key
# would be a locality hash (MinHash band — operators/dedup.py) rather than
# lang, but the pairing + threshold machinery is identical. levenshtein()
# is JVM-side on both engines.
# ---------------------------------------------------------------------------
def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "lang", F.substring("text", 1, 40).alias("prefix"))
    )
    a = d.select(
        F.col("doc_id").alias("a_id"), "lang", F.col("prefix").alias("a_prefix")
    )
    b = d.select(
        F.col("doc_id").alias("b_id"), "lang", F.col("prefix").alias("b_prefix")
    )
    return (
        a.join(b, "lang")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("edit_dist", F.levenshtein("a_prefix", "b_prefix"))
        .filter(F.col("edit_dist") <= 24)
        .select("a_id", "b_id", "lang", "edit_dist")
    )


ORACLE_DEDUP_LEVENSHTEIN = """
WITH d AS (
  SELECT doc_id, lang, substring(text, 1, 40) AS prefix
  FROM documents WHERE doc_id < 120
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.lang,
       levenshtein(a.prefix, b.prefix) AS edit_dist
FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 24
"""


QUERIES = {
    "events_gaps_islands": q_events_gaps_islands,
    "events_retention_cohort": q_events_retention_cohort,
    "window_rank_variants": q_window_rank_variants,
    "dedup_levenshtein": q_dedup_levenshtein,
}

ORACLES = {
    "events_gaps_islands": ORACLE_EVENTS_GAPS_ISLANDS,
    "events_retention_cohort": ORACLE_EVENTS_RETENTION_COHORT,
    "window_rank_variants": ORACLE_WINDOW_RANK_VARIANTS,
    "dedup_levenshtein": ORACLE_DEDUP_LEVENSHTEIN,
}
