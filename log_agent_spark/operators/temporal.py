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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """All (left, right) pairs whose [start, end] second-intervals overlap
    (``l_start <= r_end AND r_start <= l_end``, bounds inclusive).

    Grid-bucketized equi-join — the third member of this module's
    join family (as-of = union+window, band = bucket ±1, overlap = grid):
    each interval is exploded to the grid cells it covers, pairs meet on a
    shared cell, and a pair spanning several common cells is kept only in
    its FIRST common cell (the cell of the later of the two starts), so no
    distinct pass is needed. The exact predicate then drops grid neighbors
    that don't truly overlap. The shuffle is an equi-join on the cell —
    linear in matches + replication, never the quadratic theta-join a
    naive ``ON overlap`` would force at 100 TB. Pick ``bucket_s`` near the
    typical interval length: replication factor ≈ len/bucket_s + 1.
    """
    def cells(s: str, e: str):
        return F.sequence(
            F.floor(F.col(s) / bucket_s).cast("long"),
            F.floor(F.col(e) / bucket_s).cast("long"),
        )

    l = left.select(
        *[F.col(c).alias("l_" + c) for c in left.columns],
        F.explode(cells(l_start, l_end)).alias("_cell"),
    )
    r = right.select(
        *[F.col(c).alias("r_" + c) for c in right.columns],
        F.explode(cells(r_start, r_end)).alias("_cell"),
    )
    ls, le = F.col("l_" + l_start), F.col("l_" + l_end)
    rs, re = F.col("r_" + r_start), F.col("r_" + r_end)
    overlap = (ls <= re) & (rs <= le)
    first_common = F.col("_cell") == F.floor(F.greatest(ls, rs) / bucket_s).cast(
        "long"
    )
    return l.join(r, on="_cell").filter(overlap & first_common).drop("_cell")


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


def q_events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: which users' daily activity spans overlapped the
    type's daily active span, and for how long — an interval-overlap join
    between two derived interval sets (user×day activity, type×day
    activity).

    Both interval sets are day-bounded aggregates, so their sizes are
    O(users·days) and O(types·days) — already reduced before the join; the
    grid join replicates each ≤ 24 cells (1 h grid over day-bounded
    spans). All output columns are exact integers (epoch-second
    arithmetic), no float discipline needed.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("s"),
    )
    day = (F.floor(F.col("s") / 86400)).cast("long").alias("day")
    users = ev.groupBy("user_id", day).agg(
        F.min("s").alias("ustart"), F.max("s").alias("uend")
    )
    types = ev.groupBy("event_type", day).agg(
        F.min("s").alias("tstart"), F.max("s").alias("tend")
    )
    pairs = interval_overlap_join(
        users, types, "ustart", "uend", "tstart", "tend", bucket_s=3600
    )
    return pairs.groupBy(F.col("r_event_type").alias("event_type")).agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("l_user_id").alias("n_users"),
        F.sum(
            F.least(F.col("l_uend"), F.col("r_tend"))
            - F.greatest(F.col("l_ustart"), F.col("r_tstart"))
        ).alias("overlap_s"),
    )


# Oracle uses the plain theta overlap join (DuckDB's IEJoin handles it at
# oracle scale); day-bounded intervals from different days can never
# overlap, so no day equality constraint is needed on either engine.
ORACLE_EVENTS_INTERVAL_OVERLAP = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) // 1000000 AS s FROM events
), u AS (
  -- FLOOR(s / 86400.0), not s // 86400: DuckDB's integer // truncates
  -- toward zero while Spark's F.floor(s / 86400) floors — they disagree
  -- on pre-1970 (negative-s) timestamps. Both engines now floor the same
  -- IEEE double quotient.
  SELECT user_id, CAST(FLOOR(s / 86400.0) AS BIGINT) AS day,
         MIN(s) AS ustart, MAX(s) AS uend
  FROM e GROUP BY 1, 2
), t AS (
  SELECT event_type, CAST(FLOOR(s / 86400.0) AS BIGINT) AS day,
         MIN(s) AS tstart, MAX(s) AS tend
  FROM e GROUP BY 1, 2
)
SELECT t.event_type,
       COUNT(*) AS n_pairs,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users,
       CAST(SUM(LEAST(uend, tend) - GREATEST(ustart, tstart)) AS BIGINT)
         AS overlap_s
FROM u JOIN t ON u.ustart <= t.tend AND t.tstart <= u.uend
GROUP BY 1
"""


QUERIES = {
    "events_asof_join": q_events_asof_attribution,
    "events_range_join": q_events_range_join,
    "events_funnel": q_events_funnel,
    "events_interval_overlap": q_events_interval_overlap,
}

ORACLES = {
    "events_asof_join": ORACLE_EVENTS_ASOF,
    "events_range_join": ORACLE_EVENTS_RANGE_JOIN,
    "events_funnel": ORACLE_EVENTS_FUNNEL,
    "events_interval_overlap": ORACLE_EVENTS_INTERVAL_OVERLAP,
}
