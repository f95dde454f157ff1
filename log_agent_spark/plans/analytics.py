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

from log_agent_spark.baskets import capped_basket_items, capped_pp_sql
from log_agent_spark.operators.ranking import exact_ntile, with_global_order
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
# first-seen table is |users| rows — it GROWS with the data, so no
# broadcast hint (billions of users at 100 TB would OOM a forced BHJ);
# AQE picks broadcast at fixture scale and a shuffle join beyond the
# threshold. Both sides shuffle on the same user_id key, then one
# aggregation shuffle on a tiny composite key.
# ---------------------------------------------------------------------------
def q_events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    )
    first_seen = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(first_seen, "user_id")
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
        F.dense_rank().over(w).cast("long").alias("balance_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("balance_quartile"),
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
        .select("a_id", "b_id", "lang", F.col("edit_dist").cast("long").alias("edit_dist"))
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


# ---------------------------------------------------------------------------
# Market-basket co-occurrence with lift: part pairs appearing in the same
# order, scored by support and lift (P(a,b) / P(a)P(b)) — the association
# rule mining shape. The pair space is generated by a keyed self-join on
# l_orderkey, so it's bounded by (lines per order choose 2) — ~7 lines per
# TPC-H order — per order, NEVER |parts|². A super-basket of b items would
# still emit C(b,2) rows from ONE join key, so the pair-join input runs
# through the shared capped_basket_items hub valve (round 8, VERDICT r7
# item 1; cap 512 ≫ TPC-H's max basket of 7 — untruncated at every driver
# SF, mirrored in the oracle). Marginals and n_orders stay UNCAPPED (true
# frequencies — the jaccard uncapped-degree precedent); the cap bounds
# only which pairs are enumerated. Lift arithmetic is exact-integer counts
# in double division, identical both engines; filtered to pairs seen >= 3
# times to keep the report significant and small. Marginal joins are left
# to the planner/AQE: at this SF they broadcast on size; at 100× the part
# dimension they become shuffles — a hardcoded broadcast hint would force
# a dimension-sized table driver-side (VERDICT r7 item 1).
# ---------------------------------------------------------------------------
BASKET_MIN_PAIR_COUNT = 3


def q_basket_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders_df = l.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    lc = capped_basket_items(l)
    a = lc.alias("a")
    b = lc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= BASKET_MIN_PAIR_COUNT)
    )
    marginals = l.groupBy("l_partkey").agg(F.count("*").alias("n_part"))
    ma = marginals.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    mb = marginals.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    return (
        pairs.join(ma, "part_a")
        .join(mb, "part_b")
        .crossJoin(F.broadcast(n_orders_df))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_orders"), 6).alias("support"),
            F.round(
                (F.col("n_pair") * F.col("n_orders"))
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


ORACLE_BASKET_PART_PAIRS_LIFT = f"""
WITH l AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM l
), lc AS ({capped_pp_sql()}), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pair
  FROM lc a JOIN lc b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {BASKET_MIN_PAIR_COUNT}
), marginals AS (
  SELECT l_partkey, COUNT(*) AS n_part FROM l GROUP BY l_partkey
)
SELECT part_a, part_b, n_pair,
       ROUND(n_pair * 1.0 / n_orders, 6) AS support,
       ROUND((n_pair * 1.0 * n_orders) / (ma.n_part * 1.0 * mb.n_part), 4) AS lift
FROM pairs
JOIN marginals ma ON ma.l_partkey = part_a
JOIN marginals mb ON mb.l_partkey = part_b
CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# RFM segmentation: per customer, recency (days since last order),
# frequency (order count), monetary (total spend), each cut into quartiles
# → the classic 3-digit segment code. Quartiles are exact NTILE(4)
# semantics, but computed via operators/ranking.py's range-partitioned
# global rank (parallel sort + P-row offset table) instead of a global
# window — no Exchange SinglePartition anywhere, so the shape survives
# 10⁹ customers. Deterministic tie-break on c_custkey in every ordering.
# ---------------------------------------------------------------------------
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    asof = o.agg(F.max("o_orderdate").alias("asof")).select("asof")
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(asof))
        .select(
            "o_custkey",
            F.datediff(F.col("asof").cast("date"), F.col("last_order").cast("date")).alias("recency_days"),
            "frequency",
            F.round("monetary", 2).alias("monetary"),
        )
    )
    # FLAT ntiles, not chained (round 9): nesting the three rankings made
    # each exact_ntile's input embed the previous ranking's WHOLE subtree,
    # and with_global_order consumes its input in three places — the
    # compiled plan re-derived the per-customer aggregate up to 58 times
    # (range-partition exchanges are sampling-based and largely escape
    # exchange reuse). Three INDEPENDENT minimal-frame rankings of the
    # same per_cust, joined back on the key, bound the re-derivation to
    # one ranking's fan-out each (measured 3.1 s → 2.2 s at sf0.1; at
    # 100 TB the upstream is the dominant cost, so the bound matters
    # more). The three key joins co-locate on o_custkey. Values are
    # identical: each ntile sees the same total order either way.
    rq = exact_ntile(
        per_cust, 4, [F.asc("recency_days"), F.asc("o_custkey")],
        "r_quart", key_cols=["o_custkey"],
    )
    fq = exact_ntile(
        per_cust, 4, [F.desc("frequency"), F.asc("o_custkey")],
        "f_quart", key_cols=["o_custkey"],
    )
    mq = exact_ntile(
        per_cust, 4, [F.desc("monetary"), F.asc("o_custkey")],
        "m_quart", key_cols=["o_custkey"],
    )
    scored = (
        per_cust.join(rq, "o_custkey").join(fq, "o_custkey").join(mq, "o_custkey")
    )
    return scored.groupBy("r_quart", "f_quart", "m_quart").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("monetary"), 2).alias("avg_monetary"),
        F.min("o_custkey").alias("min_custkey"),
    )


ORACLE_CUSTOMER_RFM = """
WITH asof_ref AS (SELECT MAX(o_orderdate) AS ref_date FROM orders),
per_cust AS (
  SELECT o_custkey,
         datediff('day', CAST(MAX(o_orderdate) AS DATE),
                  CAST((SELECT ref_date FROM asof_ref) AS DATE)) AS recency_days,
         COUNT(*) AS frequency,
         ROUND(SUM(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_quart,
         NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_quart,
         NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_quart
  FROM per_cust
)
SELECT r_quart, f_quart, m_quart, COUNT(*) AS n_customers,
       ROUND(AVG(monetary), 2) AS avg_monetary,
       MIN(o_custkey) AS min_custkey
FROM scored GROUP BY r_quart, f_quart, m_quart
"""


# ---------------------------------------------------------------------------
# Statistical-aggregate family (regression/correlation): per-brand OLS of
# extended price on quantity plus corr/covar/stddev — the built-in
# regr_* / corr aggregates both engines implement, all computed in the
# same single partial-aggregable pass as any sum (no second scan, no
# window). Part grows 200k×sf — a growing table never gets a broadcast
# HINT (SCALE.md policy: hints only on nation/region/stats-sized frames);
# AQE broadcasts the 2-column slice at fixture scale and falls back to a
# shuffle join when it outgrows the threshold. One fact shuffle on p_brand.
# Rounded to 4dp: the sums-of-products differ only in accumulation order.
# ---------------------------------------------------------------------------
def q_stats_regression_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "intercept"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        )
    )


ORACLE_STATS_REGRESSION_BY_BRAND = """
SELECT p_brand, COUNT(*) AS n,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
       ROUND(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr,
       ROUND(stddev_samp(l_extendedprice), 4) AS price_stddev
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Pareto (80/20) revenue concentration: the smallest customer set covering
# 80% of revenue, via a running total in ONE deterministic order (revenue
# desc, custkey). Computed with operators/ranking.py's range-partitioned
# rank+cumsum (parallel sort, P-row offset table) — no single-task global
# window, so the shape survives 10⁹ customers. NOTE the distributed
# cumsum adds per-partition double sums in a different association than a
# strictly sequential scan; the crossing-point answer is identical
# because the 80% threshold comparison is far coarser than double ulps
# (and the oracle's sequential sum agrees on the fixture — verified).
# ---------------------------------------------------------------------------
PARETO_TARGET = 0.8


def q_pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    total = per_cust.agg(F.sum("rev").alias("total"))
    scored = with_global_order(
        per_cust,
        [F.desc("rev"), F.asc("o_custkey")],
        rank_col="rn",
        cumsum_of=F.col("rev"),
        cumsum_col="cum",
    ).crossJoin(F.broadcast(total))
    crossed = F.col("cum") >= PARETO_TARGET * F.col("total")
    return scored.agg(
        F.max("rn").alias("n_customers"),
        F.min(F.when(crossed, F.col("rn"))).alias("n_top"),
        F.round(
            F.min(F.when(crossed, F.col("rn")))
            / F.max("rn").cast("double"),
            4,
        ).alias("top_fraction"),
        F.round(
            F.min(F.when(crossed, F.col("cum"))) / F.max("total"), 4
        ).alias("revenue_share"),
    )


ORACLE_PARETO_REVENUE_CONCENTRATION = f"""
WITH per_cust AS (
  SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders GROUP BY o_custkey
), t AS (SELECT SUM(rev) AS total FROM per_cust),
scored AS (
  SELECT rev,
         SUM(rev) OVER (ORDER BY rev DESC, o_custkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey ASC) AS rn,
         (SELECT total FROM t) AS total
  FROM per_cust
)
SELECT MAX(rn) AS n_customers,
       MIN(CASE WHEN cum >= {PARETO_TARGET} * total THEN rn END) AS n_top,
       ROUND(MIN(CASE WHEN cum >= {PARETO_TARGET} * total THEN rn END)
             * 1.0 / MAX(rn), 4) AS top_fraction,
       ROUND(MIN(CASE WHEN cum >= {PARETO_TARGET} * total THEN cum END)
             / MAX(total), 4) AS revenue_share
FROM scored
"""


# ---------------------------------------------------------------------------
# Seasonality report: monthly revenue with month-over-month and
# year-over-year growth — the standard reporting reshape (calendar rollup
# + offset self-comparison) done as ONE aggregate and ONE ordered window
# (lag 1 / lag 12 on the month series; explicit month arithmetic guards
# the lag-12 against gaps). The windowed series is |months| rows, driver-
# negligible at any corpus size; growth ratios are rounded 4dp — the only
# doubles are the month sums, whose accumulation order varies.
# ---------------------------------------------------------------------------
def q_revenue_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = W.orderBy("y", "m")
    series = monthly.select(
        "y",
        "m",
        F.col("rev").alias("rev_raw"),
        F.lag("rev", 1).over(w).alias("prev_raw"),
        F.lag("y", 12).over(w).alias("y12"),
        F.lag("m", 12).over(w).alias("m12"),
        F.lag("rev", 12).over(w).alias("rev12_raw"),
    )
    return series.select(
        F.col("y").cast("long").alias("y"),
        F.col("m").cast("long").alias("m"),
        F.round("rev_raw", 2).alias("rev"),
        F.round(F.col("rev_raw") / F.col("prev_raw") - 1, 4).alias("mom_growth"),
        F.when(
            (F.col("y12") == F.col("y") - 1) & (F.col("m12") == F.col("m")),
            F.round(F.col("rev_raw") / F.col("rev12_raw") - 1, 4),
        ).alias("yoy_growth"),
    )


ORACLE_REVENUE_SEASONALITY = """
WITH monthly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS y, EXTRACT(month FROM o_orderdate) AS m,
         SUM(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
), series AS (
  SELECT y, m, rev AS rev_raw,
         LAG(rev, 1) OVER w AS prev_raw,
         LAG(y, 12) OVER w AS y12, LAG(m, 12) OVER w AS m12,
         LAG(rev, 12) OVER w AS rev12_raw
  FROM monthly WINDOW w AS (ORDER BY y, m)
)
SELECT y, m, ROUND(rev_raw, 2) AS rev,
       ROUND(rev_raw / prev_raw - 1, 4) AS mom_growth,
       CASE WHEN y12 = y - 1 AND m12 = m
            THEN ROUND(rev_raw / rev12_raw - 1, 4) END AS yoy_growth
FROM series
"""


# ---------------------------------------------------------------------------
# Cohort LTV matrix: customers grouped by FIRST-order month, revenue
# accumulated by months-since-acquisition — the (cohort, age) lifetime-
# value triangle. The cohort assignment is one per-customer aggregate
# joined back — |customers| keys GROWS with sf, so no broadcast hint
# (AQE broadcasts while the 2-column slice fits, shuffle-joins beyond;
# both sides already hash on o_custkey, so the unhinted join reuses the
# aggregate's exchange). The matrix is then a single (cohort, age)
# aggregate. Month arithmetic is integer (12*y + m deltas); revenue sums
# round 2dp.
# ---------------------------------------------------------------------------
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    month_idx = F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1)
    firsts = (
        o.groupBy("o_custkey")
        .agg(F.min(month_idx).alias("cohort_idx"))
    )
    return (
        o.select("o_custkey", month_idx.alias("midx"), "o_totalprice")
        .join(firsts, "o_custkey")
        .groupBy(
            F.col("cohort_idx").cast("long").alias("cohort_idx"),
            (F.col("midx") - F.col("cohort_idx")).cast("long").alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


ORACLE_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey,
         EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate) - 1
           AS midx,
         o_totalprice
  FROM orders
), firsts AS (
  SELECT o_custkey, MIN(midx) AS cohort_idx FROM o GROUP BY o_custkey
)
SELECT cohort_idx, midx - cohort_idx AS months_since,
       COUNT(DISTINCT o_custkey) AS n_active,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM o JOIN firsts USING (o_custkey)
GROUP BY cohort_idx, months_since
"""


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index per part: how concentrated each
# part's supply is across suppliers (HHI = Σ share², 1/n_suppliers..1).
# Two keyed aggregates — (part, supplier) quantities, then per-part share
# squares — with the per-part totals carried by a window on the SAME
# partitioning (no second shuffle). Shares are exact-integer quantity
# ratios; HHI rounded 4dp. Reported as a distribution summary so the
# result stays small at any |parts|.
# ---------------------------------------------------------------------------
def q_part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    per_pair = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    wpart = W.partitionBy("l_partkey")
    hhi = (
        per_pair.withColumn("total", F.sum("qty").over(wpart))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            # explicit x*x (not pow(x,2)) so the doubles match the oracle
            F.round(
                F.sum(
                    (F.col("qty") / F.col("total"))
                    * (F.col("qty") / F.col("total"))
                ),
                4,
            ).alias("hhi"),
        )
    )
    return hhi.groupBy("n_suppliers").agg(
        F.count("*").alias("n_parts"),
        F.round(F.avg("hhi"), 4).alias("avg_hhi"),
        F.round(F.min("hhi"), 4).alias("min_hhi"),
        F.round(F.max("hhi"), 4).alias("max_hhi"),
    )


ORACLE_PART_SUPPLIER_HHI = """
WITH per_pair AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), hhi AS (
  SELECT l_partkey, COUNT(*) AS n_suppliers,
         ROUND(SUM((qty / total) * (qty / total)), 4) AS hhi
  FROM (
    SELECT l_partkey, qty,
           SUM(qty) OVER (PARTITION BY l_partkey) AS total
    FROM per_pair
  ) GROUP BY l_partkey
)
SELECT n_suppliers, COUNT(*) AS n_parts,
       ROUND(AVG(hhi), 4) AS avg_hhi,
       ROUND(MIN(hhi), 4) AS min_hhi, ROUND(MAX(hhi), 4) AS max_hhi
FROM hhi GROUP BY n_suppliers
"""


# ---------------------------------------------------------------------------
# Running backlog: open orders over time as a +1/-1 delta stream — an
# order opens at o_orderdate and closes when its LAST lineitem ships.
# The classic inventory/queue-depth reshape: two keyed aggregates produce
# monthly open/close deltas, a union + one running-sum window over the
# (tiny) month series yields the end-of-month backlog. All-integer
# arithmetic; the big tables are touched once each.
# ---------------------------------------------------------------------------
def q_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    month = lambda c: (F.year(c) * 12 + (F.month(c) - 1)).cast("long")  # noqa: E731
    opened = o.groupBy(month(F.col("o_orderdate")).alias("midx")).agg(
        F.count("*").alias("delta")
    )
    closed = (
        l.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("done"))
        .groupBy(month(F.col("done")).alias("midx"))
        .agg((-F.count("*")).alias("delta"))
    )
    deltas = opened.unionByName(closed).groupBy("midx").agg(
        F.sum("delta").alias("net")
    )
    w = W.orderBy("midx").rowsBetween(W.unboundedPreceding, 0)
    return deltas.select(
        "midx", "net", F.sum("net").over(w).alias("open_backlog")
    )


ORACLE_ORDER_BACKLOG = """
WITH opened AS (
  SELECT EXTRACT(year FROM o_orderdate) * 12 + EXTRACT(month FROM o_orderdate) - 1
           AS midx,
         COUNT(*) AS delta
  FROM orders GROUP BY 1
), closed AS (
  SELECT EXTRACT(year FROM done) * 12 + EXTRACT(month FROM done) - 1 AS midx,
         -COUNT(*) AS delta
  FROM (SELECT l_orderkey, MAX(l_shipdate) AS done FROM lineitem GROUP BY 1)
  GROUP BY 1
), deltas AS (
  SELECT midx, CAST(SUM(delta) AS BIGINT) AS net
  FROM (SELECT * FROM opened UNION ALL SELECT * FROM closed)
  GROUP BY midx
)
SELECT midx, net,
       CAST(SUM(net) OVER (ORDER BY midx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS open_backlog
FROM deltas
"""


# ---------------------------------------------------------------------------
# Supplier lead-time profile: order-to-ship latency percentiles per
# supplier nation — the SLA scorecard. One broadcast of orders' (key,
# date) slice? No: orders is the bigger side, so the lineitem⨝orders join
# shuffles on orderkey once, then one exact-percentile aggregate per
# nation (25 groups). Lead times are exact integer days. supplier grows
# 10k×sf, so it carries no broadcast hint (AQE broadcasts the 2-column
# slice while it fits, shuffle-joins beyond); nation is 25 rows forever —
# that hint stays.
# ---------------------------------------------------------------------------
def q_supplier_leadtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lead = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_suppkey",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("lead_days"),
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return lead.groupBy("n_name").agg(
        F.count("*").alias("n_shipments"),
        F.round(F.expr("percentile(lead_days, 0.5)"), 1).alias("p50_days"),
        F.round(F.expr("percentile(lead_days, 0.95)"), 1).alias("p95_days"),
        F.max("lead_days").cast("long").alias("max_days"),
    )


ORACLE_SUPPLIER_LEADTIME = """
WITH lead AS (
  SELECT l_suppkey,
         datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           AS lead_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT n_name, COUNT(*) AS n_shipments,
       ROUND(quantile_cont(lead_days, 0.5), 1) AS p50_days,
       ROUND(quantile_cont(lead_days, 0.95), 1) AS p95_days,
       MAX(lead_days) AS max_days
FROM lead
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Day-over-day top movers: the event types whose daily volume changed the
# most against the previous day — the "what spiked?" triage query. One
# (day, type) aggregate, a lag window per type over the small daily
# series, top-k by absolute delta with deterministic tie-breaks.
# ---------------------------------------------------------------------------
def q_events_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("day")
    moved = daily.select(
        F.unix_millis(F.col("day").cast("timestamp")).alias("day_ms"),
        "event_type",
        "n",
        (F.col("n") - F.lag("n").over(w)).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    return moved.orderBy(
        F.abs("delta").desc(), F.asc("day_ms"), F.asc("event_type")
    ).limit(15)


ORACLE_EVENTS_TOP_MOVERS = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), moved AS (
  SELECT CAST(epoch_ms(CAST(day AS TIMESTAMP)) AS BIGINT) AS day_ms, event_type, n,
         n - LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
  FROM daily
)
SELECT day_ms, event_type, n, delta FROM moved
WHERE delta IS NOT NULL
ORDER BY ABS(delta) DESC, day_ms ASC, event_type ASC
LIMIT 15
"""


# ---------------------------------------------------------------------------
# Share-of-parent in a hierarchy: each nation's revenue as a fraction of
# its region's — the drill-down ratio every rollup report shows next to
# the absolute number. One fact aggregation keyed (region, nation) after
# the dim joins; the parent total is a window over the aggregate on
# the same region key (no second scan, no self-join). Decimal-exact sums
# feed the ratio, rounded 4dp. customer grows 150k×sf, so it carries no
# broadcast hint (AQE decides); nation/region are 25/5 rows forever —
# those hints stay.
# ---------------------------------------------------------------------------
def q_nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    wreg = W.partitionBy("r_name")
    return rev.select(
        "r_name",
        "n_name",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            (F.col("rev") / F.sum("rev").over(wreg)).cast("double"), 4
        ).alias("region_share"),
    )


ORACLE_NATION_SHARE_OF_REGION = """
WITH rev AS (
  SELECT r_name, n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
       ROUND(CAST(rev / SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE), 4)
         AS region_share
FROM rev
"""


QUERIES = {
    "nation_share_of_region": q_nation_share_of_region,
    "order_backlog": q_order_backlog,
    "supplier_leadtime": q_supplier_leadtime,
    "events_top_movers": q_events_top_movers,
    "pareto_revenue_concentration": q_pareto_revenue_concentration,
    "revenue_seasonality": q_revenue_seasonality,
    "cohort_ltv": q_cohort_ltv,
    "part_supplier_hhi": q_part_supplier_hhi,
    "basket_part_pairs_lift": q_basket_part_pairs_lift,
    "customer_rfm": q_customer_rfm,
    "stats_regression_by_brand": q_stats_regression_by_brand,
    "events_gaps_islands": q_events_gaps_islands,
    "events_retention_cohort": q_events_retention_cohort,
    "window_rank_variants": q_window_rank_variants,
    "dedup_levenshtein": q_dedup_levenshtein,
}

ORACLES = {
    "basket_part_pairs_lift": ORACLE_BASKET_PART_PAIRS_LIFT,
    "customer_rfm": ORACLE_CUSTOMER_RFM,
    "stats_regression_by_brand": ORACLE_STATS_REGRESSION_BY_BRAND,
    "pareto_revenue_concentration": ORACLE_PARETO_REVENUE_CONCENTRATION,
    "revenue_seasonality": ORACLE_REVENUE_SEASONALITY,
    "cohort_ltv": ORACLE_COHORT_LTV,
    "part_supplier_hhi": ORACLE_PART_SUPPLIER_HHI,
    "order_backlog": ORACLE_ORDER_BACKLOG,
    "supplier_leadtime": ORACLE_SUPPLIER_LEADTIME,
    "nation_share_of_region": ORACLE_NATION_SHARE_OF_REGION,
    "events_top_movers": ORACLE_EVENTS_TOP_MOVERS,
    "events_gaps_islands": ORACLE_EVENTS_GAPS_ISLANDS,
    "events_retention_cohort": ORACLE_EVENTS_RETENTION_COHORT,
    "window_rank_variants": ORACLE_WINDOW_RANK_VARIANTS,
    "dedup_levenshtein": ORACLE_DEDUP_LEVENSHTEIN,
}
