"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Custom operators per the composition rule (SURVEY.md §2.7 note): both are
expressed as compositions of existing DataFrame ops — no UDFs, no state.

- as-of join ("for each left row, the latest right row with right.ts <=
  left.ts, per key"): implemented WITHOUT a join at all — tag both sides,
  union, and carry the right payload forward with last(..., ignorenulls)
  over a per-key window ordered by (ts, side). ONE shuffle on the key;
  at 100 TB this beats any join-based formulation (no range-explosion,
  no skew amplification; ties at equal ts resolve right-before-left,
  matching DuckDB/pandas ``ASOF`` >= semantics).
- range join ("pairs within ±W"): equi-join on a time bucket of width W
  (left side replicated to 3 adjacent buckets) + exact predicate filter —
  the standard O(matches) plan that avoids the quadratic cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from log_agent_spark.sources.tables import load_table

RANGE_WINDOW_S = 60


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row + ``prefix``-renamed ``payload_cols``
    of the latest ``right`` row with ``right.ts <= left.ts`` for the same key
    (NULLs when no prior right row exists)."""
    payload_cols = payload_cols or [
        c for c in right.columns if c not in keys and c != ts_col
    ]
    out_payload = [prefix + c for c in payload_cols] + [prefix + ts_col]

    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(prefix + c) for c in payload_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(prefix + ts_col),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in keys or c == ts_col else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(prefix + c) for c in payload_cols],
        F.col(ts_col).alias(prefix + ts_col),
    )
    # right rows sort before left rows at equal ts → ties match (>= semantics)
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *left.columns,
        "_side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in out_payload],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    window_s: int = RANGE_WINDOW_S,
) -> DataFrame:
    """All (left, right) pairs with |right.ts - left.ts| <= window_s.

    Bucketized equi-join: both sides keyed by floor(ts / W); the left side
    is replicated to its bucket ±1 so every qualifying pair meets on exactly
    one bucket key; the exact band predicate filters the rest. The shuffle
    is an equi-join on the bucket — linear in matches, never quadratic.
    """
    w_us = window_s * 1_000_000
    l_bucket = (F.unix_micros(F.col(ts_col)) / w_us).cast("long")
    l = left.select(
        *[F.col(c).alias("l_" + c) for c in left.columns],
        F.explode(F.array(l_bucket - 1, l_bucket, l_bucket + 1)).alias("_bucket"),
    )
    r = right.select(
        *[F.col(c).alias("r_" + c) for c in right.columns],
        (F.unix_micros(F.col(ts_col)) / w_us).cast("long").alias("_bucket"),
    )
    band = (
        F.abs(F.unix_micros(F.col("r_" + ts_col)) - F.unix_micros(F.col("l_" + ts_col)))
        <= w_us
    )
    return l.join(r, on="_bucket").filter(band).drop("_bucket")


# ---------------------------------------------------------------------------
# queries() entries
# ---------------------------------------------------------------------------
def q_events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click attributed to the user's most recent prior view."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(clicks, views, keys=["user_id"], payload_cols=["event_id"])
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("view_event_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    )


ORACLE_EVENTS_ASOF = """
SELECT c.event_id, c.user_id, v.event_id AS view_event_id,
       date_diff('microsecond', v.ts, c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: how many other events landed within ±60 s."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    pairs = time_range_join(errors, ev.select("event_id", "ts"))
    return (
        pairs.filter(F.col("r_event_id") != F.col("l_event_id"))
        .groupBy(F.col("l_event_id").alias("event_id"))
        .agg(F.count("*").alias("n_nearby"))
    )


ORACLE_EVENTS_RANGE_JOIN = f"""
SELECT e.event_id, COUNT(*) AS n_nearby
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
JOIN events s
  ON s.ts BETWEEN e.ts - INTERVAL {RANGE_WINDOW_S} SECOND
              AND e.ts + INTERVAL {RANGE_WINDOW_S} SECOND
 AND s.event_id <> e.event_id
GROUP BY e.event_id
"""


FUNNEL_WINDOW_S = 300


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel: share of clicks preceded by a view within 5 min —
    the as-of join as a conversion metric."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    attributed = asof_join(clicks, views, keys=["user_id"], payload_cols=["event_id"])
    converted = (
        F.col("asof_ts").isNotNull()
        & (F.unix_micros("ts") - F.unix_micros("asof_ts") <= FUNNEL_WINDOW_S * 1_000_000)
    ).cast("long")
    return attributed.groupBy("user_id").agg(
        F.count("*").alias("n_clicks"),
        F.sum(converted).alias("n_converted"),
        F.round(F.sum(converted) / F.count("*"), 4).alias("conversion_rate"),
    )


ORACLE_EVENTS_FUNNEL = f"""
WITH attributed AS (
  SELECT c.user_id,
         CASE WHEN v.ts IS NOT NULL
                   AND date_diff('microsecond', v.ts, c.ts) <= {FUNNEL_WINDOW_S} * 1000000
              THEN 1 ELSE 0 END AS converted
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON c.user_id = v.user_id AND c.ts >= v.ts
)
SELECT user_id, COUNT(*) AS n_clicks,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       ROUND(SUM(converted) * 1.0 / COUNT(*), 4) AS conversion_rate
FROM attributed GROUP BY user_id
"""


QUERIES = {
    "events_asof_join": q_events_asof_attribution,
    "events_range_join": q_events_range_join,
    "events_funnel": q_events_funnel,
}

ORACLES = {
    "events_asof_join": ORACLE_EVENTS_ASOF,
    "events_range_join": ORACLE_EVENTS_RANGE_JOIN,
    "events_funnel": ORACLE_EVENTS_FUNNEL,
}
