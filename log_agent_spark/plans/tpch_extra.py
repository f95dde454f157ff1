"""Extended TPC-H coverage (SURVEY.md §2.7 — relational categories absent
from the reference, provided by Spark SQL / Catalyst).

Queries q07-q22 adapted to the driver fixture's slim TPC-H schema
(TESTDATA.md): no ``partsupp`` table, no l_commitdate / l_receiptdate /
l_shipmode / p_container / c_phone columns. Each adaptation keeps the
defining plan shape of its original — multi-join co-partitioning (q7/q8),
profit aggregation (q9), lateness predicate (q12), left-outer group count
(q13), conditional aggregate ratio (q14), agg-derived top-1 view (q15),
scalar-subquery threshold (q17), having-semi-join (q18), OR-of-ANDs
pushdown (q19), anti-join opportunity scan (q22).

Scale notes (100 TB intent) are on each query. Oracle conventions match
plans/relational.py: identical aliases both sides, DOUBLE sums rounded to
2dp, ratios to 4dp, deterministic total ORDER BY in both plans only where
the query itself demands order; otherwise comparison is order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_agent_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")


# ---------------------------------------------------------------------------
# TPC-H Q7 volume shipping: revenue flow between two nations by year.
# Scale: lineitem⋈orders⋈customer shuffle on their keys; both nation copies
# (constant-size) are broadcast-hinted; supplier GROWS with sf so it gets
# no hint — AQE broadcasts it while the runtime size is under threshold
# and falls back to a shuffle join when it is not (r10 sweep; a forced
# broadcast of a growing dim is an OOM at 100 TB). The year projection
# happens after the joins — no pre-aggregation shuffle is wasted.
# ---------------------------------------------------------------------------
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.supp_nationkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.cust_nationkey)
        .filter(pair | rpair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


ORACLE_Q07 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 market share: one nation's share of PROMO-part revenue within a
# region, by year. Scale: the conditional-sum-over-sum form computes the
# share in the SAME aggregation pass (no self-join); part filter cuts the
# probe side before the join; region/nation (constant-size) broadcast by
# hint; part/supplier grow with sf so they are unhinted — AQE broadcasts
# them only while their runtime size fits (r10 sweep).
# ---------------------------------------------------------------------------
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nationkey"),
        F.col("n_regionkey").alias("cust_regionkey"),
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.cust_nationkey)
        .join(F.broadcast(r), n1.cust_regionkey == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == n2.supp_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


ORACLE_Q08 = """
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 product-type profit (adapted: fixture has no partsupp, so profit
# = discounted revenue, no supplycost term). Scale: part filter (LIKE) is
# pushed into the part scan; nation (constant-size) broadcasts by hint,
# part/supplier are unhinted growing dims left to AQE (r10 sweep); the only
# big shuffle is the final (nation, year) aggregation, pre-reduced map-side.
# The sum runs in DECIMAL so the result is independent of summation order
# (large groups make double-rounding diverge across engines).
# ---------------------------------------------------------------------------
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


ORACLE_Q09 = """
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shipping modes / late lineitems (adapted: no l_commitdate or
# l_shipmode → "late" = shipped more than 90 days after the order date;
# bucketed by order priority). Scale: single fact-fact equi-join on
# orderkey; the CASE counts fold into one aggregation pass.
# ---------------------------------------------------------------------------
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate").cast("date"), 90).cast(
        "timestamp"
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn("is_late", late)
        .groupBy("is_late")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY is_late
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 customer order-count distribution. Left-outer join keeps the
# zero-order customers (the point of the query); two aggregations, each a
# single shuffle — the second one is over at most max(c_count) rows.
# ---------------------------------------------------------------------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 promotion effect: PROMO revenue as % of total for one month.
# Scale: date predicate pushed to the lineitem scan; part is an unhinted
# growing dim — AQE broadcasts while it fits (r10 sweep); the ratio is a
# conditional sum over sum in one pass (no second scan).
# ---------------------------------------------------------------------------
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_Q14 = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 top supplier: suppliers whose quarterly revenue equals the max.
# Scale: the revenue aggregate is computed ONCE and reused for both the max
# (a 1-row broadcast) and the join back — Spark caches nothing here, but
# the agg output is tiny (|suppliers| rows), so recompute cost is bounded
# by one extra scan of the filtered quarter, and the max-join is broadcast.
# ---------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy("l_suppkey").agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(max_rev),
            revenue.total_revenue == max_rev.max_revenue,
        )
        .join(s, revenue.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
         AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# TPC-H Q17 small-quantity-order revenue (adapted: brand filter only, no
# p_container in fixture). Parts whose lineitems fall below 20% of that
# part's average quantity. Scale: the per-part average is a pre-aggregation
# over the SAME join key (l_partkey) — Catalyst reuses the shuffle
# partitioning; the filtered part slice and the per-part threshold table
# both grow with sf, so neither is hinted — AQE broadcasts them while
# they fit and falls back to the key-aligned shuffle join when they
# don't (r10 sweep).
# ---------------------------------------------------------------------------
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    l = _t(spark, sf_dir, "lineitem")
    lp = l.join(p.select("p_partkey"), l.l_partkey == p.p_partkey)
    avg_qty = lp.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        lp.join(avg_qty, lp.l_partkey == avg_qty.ap_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q17 = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#11'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 large-volume customers: orders whose total quantity exceeds a
# threshold. Scale: the HAVING pre-aggregation runs on lineitem alone
# (shuffle on orderkey), and its small output semi-joins back — the
# customer/orders join only ever sees qualifying orderkeys.
# ---------------------------------------------------------------------------
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(epoch_ms(o_orderdate) AS BIGINT) AS o_orderdate_ms,
       o_totalprice, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate_ms, o_totalprice
HAVING SUM(l_quantity) > 150
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q19 discounted revenue (adapted: brand/size/quantity bands replace
# the container/shipmode predicates). Scale: the OR-of-ANDs predicate is a
# pure row filter evaluated inside the join's generated code — one
# lineitem pass. part is an unhinted growing dim (r10 sweep): AQE keeps
# the zero-shuffle broadcast form while part fits, and degrades to one
# key shuffle instead of an OOM when it doesn't.
# ---------------------------------------------------------------------------
def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    band1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    band2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    band3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(band1 | band2 | band3)
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q19 = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 global sales opportunity (adapted: nation-suffix buckets stand
# in for the missing phone country codes). Rich customers (above-average
# positive balance) with no urgent orders. Scale: the average is a 1-row broadcast
# scalar; the no-orders check is a LEFT ANTI join — orders is shuffled once
# on custkey and never duplicated.
# ---------------------------------------------------------------------------
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(F.avg("c_acctbal").alias("avg_bal"))
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    nokey = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return (
        nokey.withColumn("cntrycode", F.col("c_nationkey") % 5)
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


ORACLE_Q22 = """
SELECT c_nationkey % 5 AS cntrycode, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY cntrycode
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 suppliers who kept orders waiting (adapted: no l_commitdate /
# l_receiptdate → "late" = shipped more than 60 days after the order date).
# The classic form is two correlated subqueries over lineitem (EXISTS a
# second supplier on the order, NOT EXISTS a second LATE supplier); the
# Spark plan rewrites both as window counts over l_orderkey — ONE shuffle
# on the fact instead of two self-join semi/anti shuffles, with per-order
# state bounded by lines-per-order (~7), so it holds at any order count.
# nation (constant-size) stays hinted; supplier grows with sf and is
# unhinted — AQE's call (r10 sweep).
# ---------------------------------------------------------------------------
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin([f"NATION_{i}" for i in range(5)])
    )
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate").cast("date"), 60).cast(
        "timestamp"
    )
    ll = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    w = Window.partitionBy("l_orderkey")
    # EXISTS other-supplier  ⇄  distinct suppliers on the order >= 2
    # NOT EXISTS other-late  ⇄  distinct LATE suppliers == 1 (this row is late,
    # so its supplier is the one)
    flagged = (
        ll.withColumn("supp_cnt", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "late_cnt",
            F.size(
                F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
            ),
        )
        .filter(F.col("is_late") & (F.col("supp_cnt") >= 2) & (F.col("late_cnt") == 1))
    )
    return (
        flagged.join(s, flagged.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


ORACLE_Q21 = """
WITH ll AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM ll l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE l1.is_late
  AND n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
  AND EXISTS (SELECT 1 FROM ll l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM ll l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


QUERIES = {
    "q07_volume_shipping": q07_volume_shipping,
    "q08_market_share": q08_market_share,
    "q09_product_profit": q09_product_profit,
    "q12_late_shipments": q12_late_shipments,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_volume": q18_large_volume,
    "q19_banded_revenue": q19_banded_revenue,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_sales_opportunity": q22_sales_opportunity,
}

ORACLES = {
    "q07_volume_shipping": ORACLE_Q07,
    "q08_market_share": ORACLE_Q08,
    "q09_product_profit": ORACLE_Q09,
    "q12_late_shipments": ORACLE_Q12,
    "q13_customer_distribution": ORACLE_Q13,
    "q14_promo_effect": ORACLE_Q14,
    "q15_top_supplier": ORACLE_Q15,
    "q17_small_qty_revenue": ORACLE_Q17,
    "q18_large_volume": ORACLE_Q18,
    "q19_banded_revenue": ORACLE_Q19,
    "q21_waiting_suppliers": ORACLE_Q21,
    "q22_sales_opportunity": ORACLE_Q22,
}
