"""Relational query surface (SURVEY.md §2.7).

The reference has NO relational layer (verified absent: no join, no
aggregation, no window, no sort of data records anywhere in
/root/reference — SURVEY §2.7); this module is where the new engine
exposes those categories through Spark SQL / Catalyst. Each query is a
declarative DataFrame plan — Catalyst applies filter pushdown, column
pruning and join selection; nothing here hand-schedules execution.

Scale notes (100 TB design intent) are on each query. Conventions for the
DuckDB oracle: every computed column is aliased identically on both sides,
double aggregates are rounded (sums→2dp, ratios/avgs→4dp) so cross-engine
floating-point summation order can't flip the value hash, and raw
timestamps are projected to epoch millis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from log_agent_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation: TPC-H Q1 pricing summary.
# Scale: single shuffle on a 6-value grouping key; partial (map-side)
# aggregation makes the shuffle tiny regardless of input size. Only the five
# referenced columns are read (column pruning) and the shipdate predicate is
# pushed to the parquet scan.
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# 3-way join + agg + deterministic top-k: TPC-H Q3 shipping priority.
# Scale: customer filter first (pushdown), join order left to Catalyst/AQE;
# top-k via global sort of an already-aggregated (small) relation.
# ---------------------------------------------------------------------------
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_millis(F.col("o_orderdate")).alias("o_orderdate_ms"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q03 = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       epoch_ms(o_orderdate)                             AS o_orderdate_ms
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# 6-way join: TPC-H Q5 local supplier volume.
# Scale: region/nation are broadcast (tiny dims); the lineitem-orders join is
# the only large shuffle. The c_nationkey = s_nationkey predicate is the
# classic theta-ish constraint expressed as an equi-join condition.
# ---------------------------------------------------------------------------
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


ORACLE_Q05 = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Broadcast join: small dim (nation, 25 rows) explicitly broadcast — no
# shuffle of the fact side at any scale.
# ---------------------------------------------------------------------------
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


ORACLE_JOIN_BROADCAST = """
SELECT n_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS). Scale: left-semi avoids
# materializing the right side per match; Catalyst picks broadcast when the
# build side is small.
# ---------------------------------------------------------------------------
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
    )


ORACLE_SEMI_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_with_orders
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders, counted per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# Window: top-k per group (ranking) — the batch form of the reference's
# keep-latest dedup (SURVEY §2.3 T3 uses exactly this shape).
# Scale: one shuffle on the partition key; no global sort.
# ---------------------------------------------------------------------------
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rk").cast("long").alias("rk"))
    )


ORACLE_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Window: running (cumulative) aggregate with an explicit row frame.
# ---------------------------------------------------------------------------
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


ORACLE_WINDOW_RUNNING_SUM = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
WHERE o_custkey < 100
"""


# ---------------------------------------------------------------------------
# Window: analytic lag/lead — per-customer inter-order gap in days.
# ---------------------------------------------------------------------------
def q_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.when(
            prev.isNull(), F.lit(None).cast("long")
        )
        .otherwise(
            ((F.unix_millis(F.col("o_orderdate")) - F.unix_millis(prev)) / 86400000)
            .cast("long")
        )
        .alias("days_since_prev"),
    )


ORACLE_WINDOW_LAG_GAP = """
SELECT o_custkey, o_orderkey,
       CAST((epoch_ms(o_orderdate) - epoch_ms(LAG(o_orderdate) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))) / 86400000
          AS BIGINT) AS days_since_prev
FROM orders
WHERE o_custkey < 100
"""


# ---------------------------------------------------------------------------
# Grouping sets: ROLLUP over (returnflag, linestatus).
# ---------------------------------------------------------------------------
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


ORACLE_AGG_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Grouping sets: CUBE over (orderstatus, orderpriority).
# ---------------------------------------------------------------------------
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


ORACLE_AGG_CUBE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Set operations: INTERSECT + EXCEPT, tagged and unioned into one result.
# ---------------------------------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    open_buyers = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_buyers = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    both = open_buyers.intersect(done_buyers).select(
        F.lit("both").alias("tag"), F.col("o_custkey").alias("custkey")
    )
    only_open = open_buyers.exceptAll(done_buyers).select(
        F.lit("open_only").alias("tag"), F.col("o_custkey").alias("custkey")
    )
    return both.unionByName(only_open)


ORACLE_SET_OPS = """
SELECT 'both' AS tag, o_custkey AS custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'open_only' AS tag, o_custkey AS custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
"""


# ---------------------------------------------------------------------------
# Scalar function library (SURVEY §2.7 "scalar functions" + §2.4 M12 key
# construction): string ops, regex extraction, null-skipping concat_ws.
# All JVM-side built-ins — whole-stage codegen, no Python.
# ---------------------------------------------------------------------------
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.col("p_name")).alias("name_lower"),
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.regexp_extract(F.col("p_type"), r"^(\w+)", 1).alias("type_first_word"),
        F.substring(F.col("p_name"), 1, 5).alias("name_prefix"),
        F.concat_ws("/", F.col("p_brand"), F.col("p_type"), F.col("p_partkey")).alias(
            "part_key_path"
        ),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        # decimal(12,2) quantization then back to double: decimal-exact
        # rounding semantics with a hash-stable (non-Decimal) output type.
        (F.col("p_retailprice") * 1.1)
        .cast("decimal(12,2)")
        .cast("double")
        .alias("marked_up"),
    )


ORACLE_SCALAR_FUNCTIONS = """
SELECT p_partkey,
       LOWER(p_name)                          AS name_lower,
       UPPER(p_brand)                         AS brand_upper,
       LENGTH(p_name)                         AS name_len,
       regexp_extract(p_type, '^(\\w+)', 1)   AS type_first_word,
       SUBSTRING(p_name, 1, 5)                AS name_prefix,
       CONCAT_WS('/', p_brand, p_type, p_partkey) AS part_key_path,
       REVERSE(p_brand)                       AS brand_rev,
       CAST(CAST(p_retailprice * 1.1 AS DECIMAL(12,2)) AS DOUBLE) AS marked_up
FROM part
"""


# ---------------------------------------------------------------------------
# F1/F2 include/ignore regex filters (SURVEY §2.2) — the reference's
# path-pattern gate, expressed as pushdown-able rlike predicates.
# ---------------------------------------------------------------------------
def q_filter_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source").rlike("^src1"))          # include pattern (F1)
        .filter(~F.col("text").rlike("vector"))           # ignore pattern (F2)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


ORACLE_FILTER_PATTERNS = """
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE regexp_matches(source, '^src1') AND NOT regexp_matches(text, 'vector')
GROUP BY source
"""


# ---------------------------------------------------------------------------
# F6 oversize-content filter (MAX_FILE_SIZE gate, cassandra.go:17-19,66-69).
# The reference constant is 16 MiB; scaled here to the fixture's size domain.
# ---------------------------------------------------------------------------
def q_filter_oversize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.when(F.col("n_chars") <= 400, F.lit("stored"))
            .otherwise(F.lit("skipped_oversize"))
            .alias("disposition"),
        )
        .groupBy("disposition")
        .agg(F.count("*").alias("n"))
    )


ORACLE_FILTER_OVERSIZE = """
SELECT CASE WHEN n_chars <= 400 THEN 'stored' ELSE 'skipped_oversize' END AS disposition,
       COUNT(*) AS n
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 forecast revenue — the pure-pushdown showcase: all three
# predicates and both referenced columns reach the parquet scan; the agg is
# a single scalar with map-side partial sums, so the shuffle is one row per
# partition no matter the input size.
# ---------------------------------------------------------------------------
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_Q06 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# GROUPING SETS — the general form behind rollup/cube; one Expand + one
# shuffle regardless of how many sets are requested.
# ---------------------------------------------------------------------------
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


ORACLE_AGG_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# ---------------------------------------------------------------------------
# Multi-column exact DISTINCT aggregation — exercises Spark's Expand-based
# multi-distinct plan (each distinct column gets its own dedup branch before
# the final merge; still a single pass over the input).
# ---------------------------------------------------------------------------
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


ORACLE_AGG_DISTINCT = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Scalar-subquery pattern: parts larger than their brand's average size.
# Spark decorrelates to an agg + equi-join; the per-brand average table is
# tiny → broadcast, so the big side never shuffles.
# ---------------------------------------------------------------------------
def q_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    brand_avg = p.groupBy("p_brand").agg(F.avg("p_size").alias("avg_size"))
    return (
        p.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_size") > F.col("avg_size"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_above_avg"),
            F.max("p_size").alias("max_size"),
        )
    )


ORACLE_SUBQUERY_ABOVE_AVG = """
SELECT p_brand, COUNT(*) AS n_above_avg, MAX(p_size) AS max_size
FROM part p
WHERE p_size > (SELECT AVG(p_size) FROM part q WHERE q.p_brand = p.p_brand)
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 (adapted: no commit/receipt dates in the fixture → the EXISTS
# predicate is "has a returned lineitem"). Order-priority counts over a
# quarter with an EXISTS semi-join — Catalyst plans LeftSemi, so lineitem
# rows are only probed, never duplicated into the aggregate.
# ---------------------------------------------------------------------------
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_Q04 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q10: returned-item revenue per customer, top 20. Fact-side joins
# shuffle on orderkey/custkey; nation broadcasts; the global top-k is a
# sort-limit (Spark's TakeOrderedAndProject — no full sort materialized).
# ---------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Data-quality audit on the line sequence number: a well-formed order's
# l_linenumber values are contiguous 1..n, so max(linenumber) == count(*).
# The same audit pattern the agent domain needs for test-log completeness
# (did every sequence arrive before shipping the batch downstream?).
# Scale: one shuffle on l_orderkey with map-side partial agg, then a tiny
# re-agg on the 3-value status key.
# ---------------------------------------------------------------------------
def q_lineitem_sequence_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    per_order = l.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.max("l_linenumber").alias("max_lineno"),
        F.min("l_linenumber").alias("min_lineno"),
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.when(
                    (F.col("max_lineno") != F.col("n_lines"))
                    | (F.col("min_lineno") != 1),
                    1,
                ).otherwise(0)
            ).alias("n_gapped"),
            F.max("n_lines").alias("max_lines_per_order"),
        )
    )


ORACLE_LINEITEM_SEQUENCE_AUDIT = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines,
         MAX(l_linenumber) AS max_lineno, MIN(l_linenumber) AS min_lineno
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN max_lineno <> n_lines OR min_lineno <> 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_gapped,
       MAX(n_lines) AS max_lines_per_order
FROM per_order JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Deequ-style constraint audit — the declared-expectations checks a
# production table contract runs before publishing a snapshot: key
# uniqueness, referential integrity (both directions), null rates, and
# domain/range rules, emitted as one (check_name, n_violations, n_checked)
# report. Every check is a single aggregate or a key-only semi/anti join —
# content columns never move — and all checks over the same table fuse
# into one scan-side aggregate, so the audit costs ~one pass per table at
# any scale. UNION of per-check rows keeps the report extensible.
# ---------------------------------------------------------------------------
def q_dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")

    # orders-side scalar checks fuse into ONE aggregate pass
    orders_checks = o.agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_custkey"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("nonpos_price"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
    )
    orders_rows = orders_checks.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("orders.o_custkey_not_null").alias("check_name"),
                    F.col("null_custkey").alias("n_violations"),
                    F.col("n").alias("n_checked"),
                ),
                F.struct(
                    F.lit("orders.o_totalprice_positive").alias("check_name"),
                    F.col("nonpos_price").alias("n_violations"),
                    F.col("n").alias("n_checked"),
                ),
                F.struct(
                    F.lit("orders.o_orderkey_unique").alias("check_name"),
                    F.col("dup_orderkey").alias("n_violations"),
                    F.col("n").alias("n_checked"),
                ),
            )
        ).alias("r")
    ).select("r.*")

    lineitem_checks = l.agg(
        F.count("*").alias("n"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("nonpos_qty"),
        F.sum(
            (F.col("l_discount") < 0).cast("long")
            + (F.col("l_discount") > 1).cast("long")
        ).alias("bad_discount"),
    )
    lineitem_rows = lineitem_checks.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem.l_quantity_positive").alias("check_name"),
                    F.col("nonpos_qty").alias("n_violations"),
                    F.col("n").alias("n_checked"),
                ),
                F.struct(
                    F.lit("lineitem.l_discount_in_unit_range").alias("check_name"),
                    F.col("bad_discount").alias("n_violations"),
                    F.col("n").alias("n_checked"),
                ),
            )
        ).alias("r")
    ).select("r.*")

    # referential integrity: key-only anti joins, counted
    orphan_li = (
        l.select("l_orderkey")
        .join(o.select("o_orderkey"), l.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("lineitem.l_orderkey_in_orders").alias("check_name"),
            "n_violations",
            F.lit(None).cast("long").alias("n_checked"),
        )
    )
    orphan_ord = (
        o.select("o_custkey")
        # customer grows 150k×sf: no broadcast hint on the anti-join build
        # side (AQE converts to broadcast-anti while the key column fits,
        # shuffle-anti beyond — a forced hint is an OOM at 100 TB)
        .join(
            c.select("c_custkey"),
            o.o_custkey == c.c_custkey,
            "left_anti",
        )
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("orders.o_custkey_in_customer").alias("check_name"),
            "n_violations",
            F.lit(None).cast("long").alias("n_checked"),
        )
    )
    return orders_rows.unionByName(lineitem_rows).unionByName(
        orphan_li
    ).unionByName(orphan_ord)


ORACLE_DQ_CONSTRAINT_AUDIT = """
WITH o_checks AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_orderkey
  FROM orders
), l_checks AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_qty,
         CAST(SUM(CASE WHEN l_discount < 0 THEN 1 ELSE 0 END)
           + SUM(CASE WHEN l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount
  FROM lineitem
)
SELECT 'orders.o_custkey_not_null' AS check_name, null_custkey AS n_violations, n AS n_checked FROM o_checks
UNION ALL
SELECT 'orders.o_totalprice_positive', nonpos_price, n FROM o_checks
UNION ALL
SELECT 'orders.o_orderkey_unique', dup_orderkey, n FROM o_checks
UNION ALL
SELECT 'lineitem.l_quantity_positive', nonpos_qty, n FROM l_checks
UNION ALL
SELECT 'lineitem.l_discount_in_unit_range', bad_discount, n FROM l_checks
UNION ALL
SELECT 'lineitem.l_orderkey_in_orders',
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
       NULL
UNION ALL
SELECT 'orders.o_custkey_in_customer',
       (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
       NULL
"""


QUERIES = {
    "dq_constraint_audit": q_dq_constraint_audit,
    "lineitem_sequence_audit": q_lineitem_sequence_audit,
    "q01_pricing_summary": q01_pricing_summary,
    "q04_order_priority": q04_order_priority,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "agg_grouping_sets": q_agg_grouping_sets,
    "agg_distinct": q_agg_distinct,
    "subquery_above_avg": q_subquery_above_avg,
    "q03_shipping_priority": q03_shipping_priority,
    "q05_local_supplier_volume": q05_local_supplier_volume,
    "join_broadcast": q_join_broadcast,
    "join_semi": q_semi_join,
    "join_anti": q_anti_join,
    "window_topk_per_group": q_window_topk,
    "window_running_sum": q_window_running_sum,
    "window_lag_gap": q_window_lag_gap,
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "set_ops": q_set_ops,
    "scalar_functions": q_scalar_functions,
    "filter_patterns": q_filter_patterns,
    "filter_oversize": q_filter_oversize,
}

ORACLES = {
    "lineitem_sequence_audit": ORACLE_LINEITEM_SEQUENCE_AUDIT,
    "dq_constraint_audit": ORACLE_DQ_CONSTRAINT_AUDIT,
    "q01_pricing_summary": ORACLE_Q01,
    "q04_order_priority": ORACLE_Q04,
    "q06_forecast_revenue": ORACLE_Q06,
    "q10_returned_items": ORACLE_Q10,
    "agg_grouping_sets": ORACLE_AGG_GROUPING_SETS,
    "agg_distinct": ORACLE_AGG_DISTINCT,
    "subquery_above_avg": ORACLE_SUBQUERY_ABOVE_AVG,
    "q03_shipping_priority": ORACLE_Q03,
    "q05_local_supplier_volume": ORACLE_Q05,
    "join_broadcast": ORACLE_JOIN_BROADCAST,
    "join_semi": ORACLE_SEMI_JOIN,
    "join_anti": ORACLE_ANTI_JOIN,
    "window_topk_per_group": ORACLE_WINDOW_TOPK,
    "window_running_sum": ORACLE_WINDOW_RUNNING_SUM,
    "window_lag_gap": ORACLE_WINDOW_LAG_GAP,
    "agg_rollup": ORACLE_AGG_ROLLUP,
    "agg_cube": ORACLE_AGG_CUBE,
    "set_ops": ORACLE_SET_OPS,
    "scalar_functions": ORACLE_SCALAR_FUNCTIONS,
    "filter_patterns": ORACLE_FILTER_PATTERNS,
    "filter_oversize": ORACLE_FILTER_OVERSIZE,
}
