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

from log_agent_spark.baskets import BASKET_CAP as _PAIRGEN_CAP
from log_agent_spark.functions.content import (
    content_cluster_hash,
    content_cluster_hash_sql,
)
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


def key_profile(df: DataFrame, key: str, label: str) -> DataFrame:
    """One-row skew diagnosis of ``df[key]``: row/key counts, max
    multiplicity, exact p50/p99 multiplicity, and skew_ratio = max/avg.

    This is the measurement half of this module — run it BEFORE choosing
    between the plain, AQE, and salted plans above (the decision input:
    skew_ratio ≈ 1 → plain; heavy p99 → AQE split; one pathological
    max_cnt → salt). Shape: per-key count agg, then a count-of-counts
    histogram whose row count is the number of DISTINCT multiplicities —
    bounded (≤ a few hundred at any scale: multiplicities cluster), so
    the unpartitioned cumulative window over it is a k-row frame, not a
    data-sized sort. Percentiles come from the cumulative histogram via
    integer cross-multiplication (cum*2 >= tot, cum*100 >= 99*tot — no
    float compares); skew_ratio is a ratio of exact ints, rounded(4),
    strictly positive.
    """
    from pyspark.sql.window import Window as W

    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    hist = counts.groupBy("cnt").agg(F.count("*").alias("k"))
    cum = F.sum("k").over(W.orderBy("cnt"))
    tot = F.sum("k").over(W.partitionBy())
    h = hist.select("cnt", "k", cum.alias("cum"), tot.alias("tot"))
    dec = "decimal(38,0)"
    return h.agg(
        F.sum(F.col("cnt") * F.col("k")).alias("n_rows"),
        F.sum("k").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("cnt"))).alias(
            "p50_cnt"
        ),
        F.min(
            F.when(F.col("cum") * 100 >= F.col("tot") * 99, F.col("cnt"))
        ).alias("p99_cnt"),
        F.round(
            (F.max("cnt").cast(dec) * F.max("tot").cast(dec)).cast("double")
            / F.sum(F.col("cnt") * F.col("k")).cast("double"),
            4,
        ).alias("skew_ratio"),
    ).select(F.lit(label).alias("profile"), "*")


def q_skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis over the three join keys the relational plans
    actually shuffle on — the planning query a 1000-executor run issues
    before picking join strategies."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        key_profile(li, "l_orderkey", "lineitem.l_orderkey")
        .unionByName(key_profile(li, "l_suppkey", "lineitem.l_suppkey"))
        .unionByName(key_profile(orders, "o_custkey", "orders.o_custkey"))
    )


def _profile_sql(table: str, key: str) -> str:
    return f"""
  SELECT '{table}.{key}' AS profile,
         CAST(SUM(cnt * k) AS BIGINT) AS n_rows,
         CAST(SUM(k) AS BIGINT) AS n_keys,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         CAST(MIN(CASE WHEN cum * 2 >= tot THEN cnt END) AS BIGINT)
           AS p50_cnt,
         CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN cnt END) AS BIGINT)
           AS p99_cnt,
         ROUND(CAST(MAX(cnt) * MAX(tot) AS DOUBLE)
               / CAST(SUM(cnt * k) AS DOUBLE), 4) AS skew_ratio
  FROM (
    SELECT cnt, k,
           SUM(k) OVER (ORDER BY cnt) AS cum,
           SUM(k) OVER () AS tot
    FROM (
      SELECT cnt, COUNT(*) AS k FROM (
        SELECT {key}, COUNT(*) AS cnt FROM {table} GROUP BY 1
      ) GROUP BY 1
    )
  )"""


ORACLE_SKEW_KEY_PROFILE = (
    _profile_sql("lineitem", "l_orderkey")
    + "\nUNION ALL\n"
    + _profile_sql("lineitem", "l_suppkey")
    + "\nUNION ALL\n"
    + _profile_sql("orders", "o_custkey")
)


# ---------------------------------------------------------------------------
# Join-cardinality estimation — the other half of join planning (the
# skew profile above says WHERE the hot keys are; this says HOW BIG the
# join output will be). Compares the textbook independence estimate
# |L|·|R| / max(ndv_L, ndv_R) — what an optimizer computes from catalog
# stats (Selinger et al. 1979) — against the exact histogram join size
# Σ_k n_L(k)·n_R(k). The error ratio is the evidence for collecting
# per-key histograms before a 100 TB fact-fact join: a bad estimate is
# how a plan picks the wrong join strategy or under-provisions a shuffle.
# Scale shape per join: two map-side-combinable groupBy counts, one
# FULL OUTER key-equi-join of the two count tables (bounded by NDV, not
# rows), and ONE 1-row aggregate over it computing all five statistics
# at once. r10 (guide §1.2/§2.4): the original form consumed each count
# table twice (a per-side stats aggregate plus an inner join for the
# exact size), and a forked DataFrame re-derives its subtree per
# consumer — the compiled plan scanned every base table twice and ran
# every groupBy twice (32 scans / 80 exchanges / 16 BNLJ across the four
# specs). The full-outer form keeps every lc row (SUM/COUNT of cl over
# it equal the old per-side stats exactly; sum/count skip the NULLs from
# right-only keys) and the product term is non-NULL only where both
# sides match, so Σ cl·cr equals the old inner-join sum — measured
# identical output, 16 scans / 24 exchanges / 0 BNLJ, 4.25→3.27 s
# best-of-3 interleaved at sf0.1. Per-key count products are cast to
# DECIMAL(38,0) before multiplying — two hot keys of 1e5 rows each
# already put Σ cl·cr near BIGINT range at 100 TB, and Spark's non-ANSI
# LONG would wrap silently where DuckDB widens to HUGEINT.
# ---------------------------------------------------------------------------
_JOIN_CARDS = [
    # PK-FK joins: independence estimate is provably exact (err_ratio 1.0)
    # because the unique side's NDV equals its row count — the report is
    # the regression check that the estimator keeps that property.
    ("customer-orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders-lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("supplier-lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
    # m:n join (both sides repeat the key): the case where independence
    # actually errs and per-key histograms earn their keep.
    ("customer-supplier-nation", "customer", "c_nationkey", "supplier",
     "s_nationkey"),
]


def join_cardinality(
    left: DataFrame, lkey: str, right: DataFrame, rkey: str, label: str
) -> DataFrame:
    lc = left.groupBy(F.col(lkey).alias("k")).agg(F.count("*").alias("cl"))
    rc = right.groupBy(F.col(rkey).alias("k")).agg(F.count("*").alias("cr"))
    both = lc.join(rc, "k", "full_outer")
    est = F.floor(
        F.col("rows_left").cast("double")
        * F.col("rows_right").cast("double")
        / F.greatest("ndv_left", "ndv_right").cast("double")
    ).cast("bigint")
    return (
        both.agg(
            F.sum("cl").cast("bigint").alias("rows_left"),
            F.count("cl").cast("bigint").alias("ndv_left"),
            F.sum("cr").cast("bigint").alias("rows_right"),
            F.count("cr").cast("bigint").alias("ndv_right"),
            F.sum(
                F.col("cl").cast("decimal(38,0)") * F.col("cr").cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("actual_rows"),
        )
        .select(
            F.lit(label).alias("join_name"),
            "rows_left",
            "rows_right",
            "ndv_left",
            "ndv_right",
            "actual_rows",
            est.alias("est_rows"),
            # try_divide: disjoint key sets make actual_rows = 0; DuckDB
            # yields NULL on division by zero where Spark's ANSI default
            # (the driver's vanilla session) would crash.
            F.round(
                F.try_divide(est.cast("double"), F.col("actual_rows").cast("double")),
                4,
            ).alias("err_ratio"),
        )
    )


def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated vs exact join output size for four relational joins —
    three PK-FK (where the independence estimate is provably exact) plus
    the customer×supplier nation m:n join (where it actually errs) — the
    optimizer-stats fidelity report."""
    out = None
    for label, lt, lk, rt, rk in _JOIN_CARDS:
        row = join_cardinality(
            load_table(spark, sf_dir, lt), lk, load_table(spark, sf_dir, rt), rk, label
        )
        out = row if out is None else out.unionByName(row)
    return out


def _join_card_sql(label: str, lt: str, lk: str, rt: str, rk: str) -> str:
    return f"""
  SELECT '{label}' AS join_name,
         rows_left, rows_right, ndv_left, ndv_right, actual_rows,
         CAST(FLOOR(CAST(rows_left AS DOUBLE) * rows_right
                    / GREATEST(ndv_left, ndv_right)) AS BIGINT) AS est_rows,
         ROUND(FLOOR(CAST(rows_left AS DOUBLE) * rows_right
                     / GREATEST(ndv_left, ndv_right))
               / CAST(actual_rows AS DOUBLE), 4) AS err_ratio
  FROM (
    SELECT
      (SELECT CAST(SUM(cl) AS BIGINT)
         FROM (SELECT {lk}, COUNT(*) AS cl FROM {lt} GROUP BY 1)) AS rows_left,
      (SELECT CAST(COUNT(DISTINCT {lk}) AS BIGINT) FROM {lt}) AS ndv_left,
      (SELECT CAST(SUM(cr) AS BIGINT)
         FROM (SELECT {rk}, COUNT(*) AS cr FROM {rt} GROUP BY 1)) AS rows_right,
      (SELECT CAST(COUNT(DISTINCT {rk}) AS BIGINT) FROM {rt}) AS ndv_right,
      (SELECT CAST(SUM(CAST(cl AS HUGEINT) * cr) AS BIGINT)
         FROM (SELECT {lk} AS k, COUNT(*) AS cl FROM {lt} GROUP BY 1) lc
         JOIN (SELECT {rk} AS k, COUNT(*) AS cr FROM {rt} GROUP BY 1) rc
           USING (k)) AS actual_rows
  )"""


ORACLE_JOIN_CARDINALITY_ESTIMATE = "\nUNION ALL\n".join(
    _join_card_sql(*spec) for spec in _JOIN_CARDS
)


# ---------------------------------------------------------------------------
# Pair-generation blowup radar — the third leg of the planning family
# (skew_key_profile says where the ROW hotspots are; join_cardinality
# says how big a two-table join gets; this says how big every SELF-join
# PAIR space gets, which is what actually decides whether the engine's
# valves bite). Each leg measures the EXACT key granularity and cap of
# the valve that governs it (ADVICE r8: a leg whose cap/key matches no
# implemented valve is misleading as a planning diagnostic):
#   * order baskets per l_orderkey against BASKET_CAP=512 — the shared
#     capped_basket_items hub valve (baskets.py) every co-purchase
#     consumer reads;
#   * CLICKS per (user_id, calendar day) against _ATTR_DAY_CLICK_CAP=32
#     — the attribution valve's own key and cap (plans/events.py);
#   * exact-content dup clusters against BASKET_CAP as a WHAT-IF: the
#     pair-listing queries carry no cap by design (their output is
#     inherently C(c,2); the cluster-form queries are the scale
#     representation — see QUERIES.md), so this leg quantifies the mass
#     a cap WOULD remove, it does not describe an implemented valve.
# The ``cap`` column makes each row self-describing; keys_over_cap > 0
# on a valved leg means the valve actively truncates at that scale
# (tools/skew_probe.py turns that into a loud gate — VERDICT r8 item 5).
#
# Scale shape: one map-side-combinable count per key domain (the basket
# leg dedups (order, part) first — one extra shuffle), then a 1-row agg
# per domain; nothing downstream of the per-key counts exceeds the key
# cardinality. Pair arithmetic: n(n-1) is computed in BIGINT and /2
# passes through DOUBLE (exact — the product is even and < 2^53 until a
# single key holds ~9.5e7 rows, far past where the cap has already
# flagged it; DuckDB's integer '/' widens identically).
# ---------------------------------------------------------------------------
def pairgen_profile(per_key: DataFrame, label: str, cap: int = _PAIRGEN_CAP) -> DataFrame:
    """1-row blowup profile over a (key, n) per-key count frame, against
    the pair-valve ``cap`` that governs (or would govern) that key."""
    pairs = (F.col("n") * (F.col("n") - 1) / F.lit(2)).cast("bigint")
    capped_n = F.least(F.col("n"), F.lit(cap))
    capped_pairs = ((capped_n * (capped_n - 1)) / F.lit(2)).cast("bigint")
    return (
        per_key.agg(
            F.count("*").alias("n_keys"),
            F.max("n").alias("max_n"),
            F.sum(pairs).alias("pair_mass"),
            F.max(pairs).alias("top_pair_mass"),
            F.sum(
                F.when(F.col("n") > cap, F.lit(1)).otherwise(F.lit(0))
            ).alias("keys_over_cap"),
            F.sum(capped_pairs).alias("capped_pair_mass"),
        )
        .select(
            F.lit(label).alias("source"),
            F.lit(cap).cast("bigint").alias("cap"),
            "n_keys",
            "max_n",
            "pair_mass",
            F.round(
                F.when(
                    F.col("pair_mass") > 0,
                    F.col("top_pair_mass") / F.col("pair_mass"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("top_pair_share"),
            "keys_over_cap",
            "capped_pair_mass",
        )
    )


def q_skew_pairgen_radar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C(n,2) blowup audit over the three self-join pair spaces the
    engine generates — order baskets vs the BASKET_CAP hub valve,
    per-(user, day) clicks vs the attribution click cap, and dup
    clusters vs a what-if cap (no valve implemented there by design)."""
    from log_agent_spark.plans.events import _ATTR_DAY_CLICK_CAP

    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
    )
    user_day_clicks = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    clusters = (
        load_table(spark, sf_dir, "documents")
        .groupBy(content_cluster_hash().alias("k"))
        .agg(F.count("*").alias("n"))
    )
    return (
        pairgen_profile(baskets, "lineitem.l_orderkey basket")
        .unionByName(
            pairgen_profile(
                user_day_clicks,
                "events clicks per (user_id, day)",
                cap=_ATTR_DAY_CLICK_CAP,
            )
        )
        .unionByName(pairgen_profile(clusters, "documents dup-cluster (what-if)"))
    )


def _pairgen_sql(per_key: str, label: str, cap: int = _PAIRGEN_CAP) -> str:
    return f"""
  SELECT '{label}' AS source,
         CAST({cap} AS BIGINT) AS cap,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(n) AS BIGINT) AS max_n,
         CAST(SUM(CAST(n * (n - 1) / 2 AS BIGINT)) AS BIGINT) AS pair_mass,
         ROUND(CASE WHEN SUM(CAST(n * (n - 1) / 2 AS BIGINT)) > 0
               THEN MAX(CAST(n * (n - 1) / 2 AS BIGINT))
                    / CAST(SUM(CAST(n * (n - 1) / 2 AS BIGINT)) AS DOUBLE)
               ELSE 0.0 END, 4) AS top_pair_share,
         CAST(SUM(CASE WHEN n > {cap} THEN 1 ELSE 0 END) AS BIGINT)
           AS keys_over_cap,
         CAST(SUM(CAST(LEAST(n, {cap})
                       * (LEAST(n, {cap}) - 1) / 2 AS BIGINT))
              AS BIGINT) AS capped_pair_mass
  FROM ({per_key})"""


def _radar_oracle_sql() -> str:
    from log_agent_spark.plans.events import _ATTR_DAY_CLICK_CAP

    return (
        _pairgen_sql(
            """SELECT COUNT(*) AS n FROM (
                 SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
               ) GROUP BY l_orderkey""",
            "lineitem.l_orderkey basket",
        )
        + "\nUNION ALL\n"
        + _pairgen_sql(
            """SELECT COUNT(*) AS n FROM events
               WHERE event_type = 'click'
               GROUP BY user_id, CAST(ts AS DATE)""",
            "events clicks per (user_id, day)",
            cap=_ATTR_DAY_CLICK_CAP,
        )
        + "\nUNION ALL\n"
        + _pairgen_sql(
            f"""SELECT COUNT(*) AS n FROM documents
                GROUP BY {content_cluster_hash_sql()}""",
            "documents dup-cluster (what-if)",
        )
    )


ORACLE_SKEW_PAIRGEN_RADAR = _radar_oracle_sql()


QUERIES = {
    "skew_salted_distinct": q_skew_salted_distinct,
    "skew_salted_join": q_skew_salted_join,
    "skew_key_profile": q_skew_key_profile,
    "join_cardinality_estimate": q_join_cardinality_estimate,
    "skew_pairgen_radar": q_skew_pairgen_radar,
}
ORACLES = {
    "skew_salted_distinct": ORACLE_SKEW_SALTED_DISTINCT,
    "skew_salted_join": ORACLE_SKEW_SALTED_JOIN,
    "skew_key_profile": ORACLE_SKEW_KEY_PROFILE,
    "join_cardinality_estimate": ORACLE_JOIN_CARDINALITY_ESTIMATE,
    "skew_pairgen_radar": ORACLE_SKEW_PAIRGEN_RADAR,
}
