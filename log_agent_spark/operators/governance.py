"""Data-governance audits: re-identification risk, deletion impact, and
statistical-forensics data quality.

A training-data pipeline at 100 TB is also a compliance surface — before
a corpus ships, the operator on call answers three questions that none of
the relational/dedup families cover:

- *Can rows be re-identified?* k-anonymity / l-diversity over the
  quasi-identifier columns (Sweeney 2002; Machanavajjhala et al. 2006).
- *What does a deletion request touch?* The GDPR/right-to-be-forgotten
  cascade: given a deletion cohort, how many rows in each downstream
  table reference it (the impact estimate that sizes the actual delete
  job).
- *Do the numbers look organic?* Benford first-digit forensics on a
  monetary column — fabricated or truncated feeds show up as first-digit
  distributions far from log10(1 + 1/d) (Benford 1938; standard audit
  practice).

All four queries are k-row reports built from one or two aggregations
over the scanned table — the scale shape is a single groupBy (bounded
output: ≤ digits, ≤ distinct group sizes, ≤ tables) plus broadcast
1-row totals; nothing all-pairs, nothing driver-side. Reference parity:
the reference agent has no governance layer at all (its closest analog
is the checksum/oversize gates, watchdog/handler/handler.go:13-30); this
module is part of the training-pipeline extension surface SURVEY.md §2
lists alongside dedup/similarity/curation.

Cross-engine float discipline (see operators/timeseries.py for the
recipe catalog): every percentage is a ratio of exact integers rounded
at 6, Benford's expected shares are Python-formatted literals pasted
into BOTH engines' plans, and signed deviations get the ``+ 0.0``
negative-zero guard.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from log_agent_spark.functions.content import (
    content_cluster_hash,
    content_cluster_hash_sql,
)
from log_agent_spark.plans.sampling import _hash_bucket, _oracle_bucket
from log_agent_spark.sources.tables import load_table

# Quasi-identifier bucketing: account balance in coarse 1000-unit bands.
# floor(double / 1000) is IEEE division + floor — identical bits on both
# engines; the band index is then an exact small integer.
_ACCTBAL_BAND = 1000

# The conventional release threshold shared by every audit in the module:
# a QI group smaller than this re-identifies (k histogram), and the
# generalization ladder coarsens until groups reach it. ONE constant so a
# policy change can never make the triad's audits disagree on what
# "re-identifiable" means.
_K_ANON = 5


def _qi_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per quasi-identifier group (k-anonymity's partition): group size.

    QI = (nation, mktsegment, acctbal band) — the published-attribute
    combination an attacker could link on. One groupBy over the table;
    group count is bounded by |nations| × |segments| × |bands|, so
    everything downstream of the first aggregate is k-row.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / _ACCTBAL_BAND).cast("bigint").alias(
            "bal_band"
        ),
    ).agg(F.count("*").alias("grp_sz"))


def q_privacy_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk histogram: for each occurring group size k, how
    many QI groups and rows sit at that k, what share of all rows, and
    whether that k re-identifies (k < _K_ANON, the conventional release
    threshold shared with the generalization ladder).

    The histogram row count equals the number of DISTINCT group sizes —
    bounded at any data scale (sizes cluster), like the skew profile's
    count-of-counts table. Totals arrive as a broadcast 1-row aggregate.
    """
    groups = _qi_groups(spark, sf_dir)
    hist = groups.groupBy(F.col("grp_sz").alias("k")).agg(
        F.count("*").alias("n_groups"),
        F.sum("grp_sz").alias("n_rows"),
    )
    # r10 (guide §1.2): the total used to be a second aggregate of
    # `groups` joined back — re-deriving the whole scan+QI-groupBy. The
    # same integer arrives as Σ n_rows over the BOUNDED count-of-counts
    # histogram (one row per distinct group size), so a single
    # unpartitioned window over the histogram replaces the duplicate
    # subtree and the 1-row cross join.
    return (
        hist.withColumn(
            "tot_rows", F.sum("n_rows").over(W.partitionBy())
        )
        .select(
            "k",
            "n_groups",
            "n_rows",
            F.round(F.col("n_rows") * 100.0 / F.col("tot_rows"), 6).alias(
                "pct_rows"
            ),
            (F.col("k") < _K_ANON).alias("reidentifiable"),
        )
        .orderBy("k")
    )


ORACLE_PRIVACY_KANONYMITY = f"""
WITH grp AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         c_mktsegment AS segment,
         CAST(FLOOR(c_acctbal / {_ACCTBAL_BAND}) AS BIGINT) AS bal_band,
         COUNT(*) AS grp_sz
  FROM customer GROUP BY 1, 2, 3
), hist AS (
  SELECT grp_sz AS k, COUNT(*) AS n_groups, SUM(grp_sz) AS n_rows
  FROM grp GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_rows AS BIGINT) AS n_rows,
       ROUND(n_rows * 100.0 / (SELECT SUM(grp_sz) FROM grp), 6) AS pct_rows,
       k < {_K_ANON} AS reidentifiable
FROM hist
ORDER BY k
"""


def q_privacy_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity histogram: for each occurring l (#distinct sensitive
    values within a QI group), the number of groups and rows. A
    k-anonymous group with l = 1 still leaks the sensitive value outright
    — this is the audit k-anonymity alone misses.

    This audit models a release where mktsegment is the PAYLOAD: QI =
    (nation, acctbal band) only, sensitive = c_mktsegment (5 values), so
    l ranges 1..5 and genuinely varies per group. It must NOT reuse the
    k-audit's 3-attribute grid with a per-customer-unique sensitive
    column (c_name): that makes l_div ≡ grp_sz — a histogram
    byte-identical to the k histogram that can never flag a skewed
    group (review finding, round 6). Same bounded count-of-counts
    shape as the k histogram.
    """
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.floor(F.col("c_acctbal") / _ACCTBAL_BAND).cast("bigint").alias(
            "bal_band"
        ),
    ).agg(
        F.count("*").alias("grp_sz"),
        F.countDistinct("c_mktsegment").alias("l_div"),
    )
    hist = groups.groupBy(F.col("l_div").alias("l")).agg(
        F.count("*").alias("n_groups"),
        F.sum("grp_sz").alias("n_rows"),
    )
    # r10: total via window over the bounded l histogram (≤ #distinct
    # l values rows) — see q_privacy_kanonymity; drops the duplicate
    # scan+groupBy subtree the totals join re-derived.
    return (
        hist.withColumn(
            "tot_rows", F.sum("n_rows").over(W.partitionBy())
        )
        .select(
            "l",
            "n_groups",
            "n_rows",
            F.round(F.col("n_rows") * 100.0 / F.col("tot_rows"), 6).alias(
                "pct_rows"
            ),
        )
        .orderBy("l")
    )


ORACLE_PRIVACY_LDIVERSITY = f"""
WITH grp AS (
  SELECT c_nationkey,
         FLOOR(c_acctbal / {_ACCTBAL_BAND}) AS bal_band,
         COUNT(*) AS grp_sz,
         COUNT(DISTINCT c_mktsegment) AS l_div
  FROM customer GROUP BY 1, 2
)
SELECT CAST(l_div AS BIGINT) AS l,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(grp_sz) AS BIGINT) AS n_rows,
       ROUND(SUM(grp_sz) * 100.0 / (SELECT SUM(grp_sz) FROM grp), 6)
         AS pct_rows
FROM grp GROUP BY 1
ORDER BY 1
"""


# Benford expected share of first digit d is 100·log10(1 + 1/d). Computed
# ONCE in Python and pasted as the same literal into both engines — no
# cross-engine log10 in the plans at all.
_BENFORD_PCT = {d: round(100.0 * math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of o_totalprice: per digit 1-9, the
    observed count/share vs Benford's law, and the signed deviation.

    First digit extracted integer-exactly: totalprice > 1 always, so
    ``substr(cast(cast(floor(x) as bigint) as string), 1, 1)`` — floor of
    a double is IEEE-identical on both engines and integer→string
    formatting is canonical, avoiding the double→string and the
    cast-rounding (Spark truncates, DuckDB rounds) divergence classes.
    One scan, 9-row output, broadcast 1-row total.
    """
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    exp_pct = F.element_at(
        F.create_map(
            *[F.lit(x) for d in range(1, 10) for x in (d, _BENFORD_PCT[d])]
        ),
        F.col("digit").cast("int"),
    )
    obs_pct = F.col("n") * 100.0 / F.col("tot")
    # r10: total via window over the 9-row digit histogram instead of a
    # second aggregate of `obs` joined back (which re-derived the whole
    # orders scan+groupBy).
    return (
        obs.withColumn("tot", F.sum("n").over(W.partitionBy()))
        .select(
            "digit",
            "n",
            F.round(obs_pct, 6).alias("obs_pct"),
            exp_pct.alias("benford_pct"),
            (F.round(obs_pct - exp_pct, 6) + F.lit(0.0)).alias("dev_pct"),
        )
        .orderBy("digit")
    )


def _benford_case() -> str:
    branches = "\n         ".join(
        f"WHEN {d} THEN {_BENFORD_PCT[d]}" for d in range(1, 10)
    )
    return f"CASE digit {branches} END"


ORACLE_DQ_BENFORD = f"""
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit,
         COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT digit, CAST(n AS BIGINT) AS n,
       ROUND(n * 100.0 / (SELECT SUM(n) FROM obs), 6) AS obs_pct,
       {_benford_case()} AS benford_pct,
       ROUND(n * 100.0 / (SELECT SUM(n) FROM obs)
             - {_benford_case()}, 6) + 0.0 AS dev_pct
FROM obs
ORDER BY digit
"""


# Deletion cohort: a deterministic 1% of customers (md5 bucket 0 of 100 —
# the same cross-engine hash the split/sampling family standardizes on).
_GDPR_BUCKETS = 100


def q_gdpr_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact estimate: for a deterministic 1%
    customer deletion cohort, the affected row count and share in each
    table it cascades to (customer → orders → lineitem).

    Shape: the cohort key set is |customers|/100 — joined as a SEMI join
    at each hop, so payload columns never shuffle; each hop's key column
    feeds the next. Totals are per-table 1-row aggregates broadcast onto
    k-row results. At 100 TB each semi join is an AQE-planned shuffle
    join on the key (the cohort outgrows a broadcast at ~10⁹ customers,
    but stays key-only); the final report is 3 rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    cohort = cust.filter(
        _hash_bucket(F.col("c_custkey"), _GDPR_BUCKETS) == 0
    ).select("c_custkey")
    aff_orders = orders.join(
        cohort, orders.o_custkey == cohort.c_custkey, "left_semi"
    ).select("o_orderkey")
    aff_li = li.join(
        aff_orders, li.l_orderkey == aff_orders.o_orderkey, "left_semi"
    )

    def report(name: str, aff: DataFrame, full: DataFrame) -> DataFrame:
        a = aff.agg(F.count("*").alias("n_affected"))
        t = full.agg(F.count("*").alias("n_total"))
        return (
            a.join(F.broadcast(t))
            .select(
                F.lit(name).alias("tbl"),
                "n_affected",
                "n_total",
                F.round(
                    F.col("n_affected") * 100.0 / F.col("n_total"), 6
                ).alias("pct_affected"),
            )
        )

    return (
        report("customer", cohort, cust)
        .unionByName(report("orders", aff_orders, orders))
        .unionByName(report("lineitem", aff_li, li))
    )


ORACLE_GDPR_CASCADE = f"""
WITH cohort AS (
  SELECT c_custkey FROM customer
  WHERE {_oracle_bucket('c_custkey', _GDPR_BUCKETS)} = 0
), aff_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM cohort)
)
SELECT 'customer' AS tbl,
       (SELECT COUNT(*) FROM cohort) AS n_affected,
       (SELECT COUNT(*) FROM customer) AS n_total,
       ROUND((SELECT COUNT(*) FROM cohort) * 100.0
             / (SELECT COUNT(*) FROM customer), 6) AS pct_affected
UNION ALL
SELECT 'orders',
       (SELECT COUNT(*) FROM aff_orders),
       (SELECT COUNT(*) FROM orders),
       ROUND((SELECT COUNT(*) FROM aff_orders) * 100.0
             / (SELECT COUNT(*) FROM orders), 6)
UNION ALL
SELECT 'lineitem',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders)),
       (SELECT COUNT(*) FROM lineitem),
       ROUND((SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders))
             * 100.0 / (SELECT COUNT(*) FROM lineitem), 6)
"""


# ---------------------------------------------------------------------------
# Generalization ladder: the anonymization PLAN that follows the risk
# measurement above. k-anonymity says how many rows sit in small QI
# groups; the release engineer's next question is "how much do I have to
# coarsen each row's quasi-identifiers before its group reaches k?"
# (the Datafly/Mondrian generalization idea, Sweeney 2002 / LeFevre
# 2006, collapsed to a fixed suppression ladder):
#   level 0 = (nation, segment, balance band)  — full precision
#   level 1 = (nation, segment)                — drop the band
#   level 2 = (nation)                         — drop the segment
#   level 3 = fully suppressed                 — even nation is too small
# Each row gets the minimal level whose RESIDUAL group (see the function
# docstring) reaches k >= _K_ANON; the report histograms rows and
# distinct released groups per level — the utility-vs-privacy curve of
# the release.
# Scale shape: three map-side-combinable groupBy counts (bounded outputs:
# |QI| combinations), each broadcast-joined back to the row scan; one
# final k-row aggregate. All counts exact integers; pct is one integer
# ratio. (_K_ANON is the module-level shared threshold, defined with the
# QI bucketing at the top.)
# ---------------------------------------------------------------------------


def q_privacy_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RESIDUAL-group semantics: the k-check at each coarser level counts
    only the rows still needing generalization (the residue of the finer
    levels), not the whole coarser group. That is what makes every
    RELEASED group provably >= k — checking the full coarser-group size
    would release sub-k residues (a 6-row (nation, segment) group with 5
    of its rows already released at level 0 would publish a 1-row
    level-1 residue, re-identifiable by subtraction)."""
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / _ACCTBAL_BAND).cast("bigint").alias(
            "bal_band"
        ),
    )
    # r10 (guide §2.4): the ladder used to materialize each residue as a
    # groupBy + broadcast-join-back (s0/c0 → s1r/c1 → s2r/c2) and then
    # union four legs, each leg re-deriving the WHOLE chain — the compiled
    # plan scanned customer 22×. The residual-group counts are window
    # counts over progressively coarser keys on ONE pass: sz1r counts only
    # the sz0<k residue inside its (nation, segment) group, sz2r only the
    # doubly-residual rows inside its nation group — the exact residual
    # semantics of the join form (integer counts, bit-identical), with the
    # union-of-filters collapsed into a CASE on the same row. 22 scans →
    # 1 scan, 3 window exchanges, 0 joins.
    kf = F.lit(_K_ANON)
    sz0 = F.count(F.lit(1)).over(
        W.partitionBy("nationkey", "segment", "bal_band")
    )
    lad = base.withColumn("sz0", sz0).withColumn(
        "sz1r",
        F.count(F.when(F.col("sz0") < kf, F.lit(1))).over(
            W.partitionBy("nationkey", "segment")
        ),
    )
    lad = lad.withColumn(
        "sz2r",
        F.count(
            F.when((F.col("sz0") < kf) & (F.col("sz1r") < kf), F.lit(1))
        ).over(W.partitionBy("nationkey")),
    )
    level = (
        F.when(F.col("sz0") >= kf, F.lit(0))
        .when(F.col("sz1r") >= kf, F.lit(1))
        .when(F.col("sz2r") >= kf, F.lit(2))
        .otherwise(F.lit(3))
        .cast("bigint")
    )
    rk = (
        F.when(
            F.col("sz0") >= kf,
            F.concat_ws("|", "nationkey", "segment", "bal_band"),
        )
        .when(F.col("sz1r") >= kf, F.concat_ws("|", "nationkey", "segment"))
        .when(F.col("sz2r") >= kf, F.concat_ws("|", "nationkey"))
        .otherwise(F.lit("*"))
    )
    tagged = lad.select(level.alias("level"), rk.alias("rk"))
    total_w = W.partitionBy()
    return (
        tagged.groupBy("level")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("rk").cast("bigint").alias("n_groups"),
        )
        .select(
            "level",
            "n_rows",
            "n_groups",
            # ×100 and round(6) like every other pct_* column in the
            # module — a 0-1 fraction under the same name invited a
            # 100x misread across reports (review finding, round 6)
            F.round(
                F.col("n_rows") * 100.0 / F.sum("n_rows").over(total_w),
                6,
            ).alias("pct_rows"),
        )
    )


ORACLE_PRIVACY_GENERALIZATION_LADDER = f"""
WITH base AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         c_mktsegment AS segment,
         CAST(FLOOR(c_acctbal / {_ACCTBAL_BAND}) AS BIGINT) AS bal_band
  FROM customer
), s0 AS (
  SELECT nationkey, segment, bal_band, COUNT(*) AS sz0
  FROM base GROUP BY 1, 2, 3
), c0 AS (
  SELECT base.*, sz0 FROM base JOIN s0 USING (nationkey, segment, bal_band)
), r1 AS (
  SELECT * FROM c0 WHERE sz0 < {_K_ANON}
), s1r AS (
  SELECT nationkey, segment, COUNT(*) AS sz1r FROM r1 GROUP BY 1, 2
), c1 AS (
  SELECT r1.*, sz1r FROM r1 JOIN s1r USING (nationkey, segment)
), r2 AS (
  SELECT * FROM c1 WHERE sz1r < {_K_ANON}
), s2r AS (
  SELECT nationkey, COUNT(*) AS sz2r FROM r2 GROUP BY 1
), c2 AS (
  SELECT r2.*, sz2r FROM r2 JOIN s2r USING (nationkey)
), tagged AS (
  SELECT 0 AS level, concat_ws('|', nationkey, segment, bal_band) AS rk
  FROM c0 WHERE sz0 >= {_K_ANON}
  UNION ALL
  SELECT 1, concat_ws('|', nationkey, segment)
  FROM c1 WHERE sz1r >= {_K_ANON}
  UNION ALL
  SELECT 2, concat_ws('|', nationkey) FROM c2 WHERE sz2r >= {_K_ANON}
  UNION ALL
  SELECT 3, '*' FROM c2 WHERE sz2r < {_K_ANON}
)
SELECT CAST(level AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT rk) AS BIGINT) AS n_groups,
       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 6) AS pct_rows
FROM tagged
GROUP BY level
"""


# ---------------------------------------------------------------------------
# t-closeness (Li, Li & Venkatasubramanian, ICDE 2007): the third leg of
# the release-audit triad. k-anonymity bounds group SIZE, l-diversity
# bounds the COUNT of sensitive values, but a group can satisfy both and
# still leak by skew (90% of one group is status 'F' while the corpus is
# 30% 'F'). t = the distance between each QI group's sensitive-value
# distribution and the global one; for categorical attributes the metric
# is total variation distance TVD = ½·Σ_v |p_g(v) − p(v)|.
#
# Cross-engine exactness: TVD is computed over a COMMON DENOMINATOR —
# ½·Σ_v |cnt_gv·N − cnt_v·n_g| / (n_g·N) — so the summed numerator is an
# exact integer on both engines and only ONE IEEE division happens per
# group, then round(6). The numerator multiplies two count-scaled values,
# so past n_total·n_g ≈ 9.2e18 a BIGINT product would raise
# ARITHMETIC_OVERFLOW under Spark ANSI while DuckDB silently widens to
# HUGEINT — a cross-engine divergence. Both engines therefore compute the
# products as DECIMAL(18,0)×DECIMAL(18,0) → DECIMAL(36,0) and sum into
# DECIMAL(38,0): exact to n_total ≤ 1e18 rows, identical overflow
# behavior, and the single numerator→double conversion at the division is
# the same IEEE round-to-nearest on both engines. Missing (group, value) cells contribute
# |0·N − cnt_v·n_g|, so the group×value frame is completed by a
# broadcast cross join of two BOUNDED aggregates (|QI groups| ×
# |distinct statuses| — priorities×years×statuses ≈ 35×3 at any scale).
# Scale: the only data-scaled shuffle is the first (QI, value) groupBy;
# everything after is k-row. QI here = (o_orderpriority, order year),
# sensitive = o_orderstatus.
# ---------------------------------------------------------------------------
_T_CLOSE_THRESHOLD = 0.2


def q_privacy_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.col("o_orderstatus").alias("status"),
    )
    cells = o.groupBy("priority", "yr", "status").agg(
        F.count("*").alias("cnt_gv")
    )
    grp = cells.groupBy("priority", "yr").agg(F.sum("cnt_gv").alias("n_g"))
    # r10: n_total rides on `glob` as a window sum over the bounded
    # status histogram (≤ #distinct order statuses rows) instead of a
    # second aggregate of `glob` cross-joined back — the totals subtree
    # re-derived the whole orders scan + cells groupBy. Exact integer
    # sum: order-independent, value-identical.
    glob = (
        cells.groupBy("status")
        .agg(F.sum("cnt_gv").alias("cnt_v"))
        .withColumn("n_total", F.sum("cnt_v").over(W.partitionBy()))
    )
    # complete the bounded group×value grid so absent cells still count.
    # eqNullSafe: a NULL-orderdate QI group must match ITS OWN cells (a
    # null-unsafe join would orphan it and report a constant bogus t).
    grid = grp.crossJoin(F.broadcast(glob))
    full = (
        grid.join(
            cells.select(
                F.col("priority").alias("c_priority"),
                F.col("yr").alias("c_yr"),
                F.col("status").alias("c_status"),
                "cnt_gv",
            ),
            F.col("priority").eqNullSafe(F.col("c_priority"))
            & F.col("yr").eqNullSafe(F.col("c_yr"))
            & F.col("status").eqNullSafe(F.col("c_status")),
            "left",
        )
        .select(
            "priority",
            "yr",
            "n_g",
            "cnt_v",
            "n_total",
            F.coalesce(F.col("cnt_gv"), F.lit(0)).alias("cnt_gv"),
        )
    )
    per_group = (
        full.groupBy("priority", "yr", "n_g")
        .agg(
            F.sum(
                F.abs(
                    F.col("cnt_gv").cast("decimal(18,0)")
                    * F.col("n_total").cast("decimal(18,0)")
                    - F.col("cnt_v").cast("decimal(18,0)")
                    * F.col("n_g").cast("decimal(18,0)")
                )
            ).alias("tvd_num"),
            F.max("n_total").alias("n_total"),
        )
    )
    t = F.col("tvd_num").cast("double") / (
        F.lit(2.0) * F.col("n_g") * F.col("n_total")
    )
    return per_group.select(
        "priority",
        "yr",
        F.col("n_g").alias("n_rows"),
        F.round(t, 6).alias("t_distance"),
        # flag on the ROUNDED value as displayed: flagging unrounded t
        # lets two rows print the same t_distance with opposite breach
        # verdicts ("0.2 > 0.2") — the report must agree with itself
        (F.round(t, 6) > _T_CLOSE_THRESHOLD).alias("breaches_t"),
    ).orderBy("priority", "yr")


ORACLE_PRIVACY_TCLOSENESS = f"""
WITH o AS (
  SELECT o_orderpriority AS priority,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         o_orderstatus AS status
  FROM orders
), cells AS (
  SELECT priority, yr, status, COUNT(*) AS cnt_gv
  FROM o GROUP BY 1, 2, 3
), grp AS (
  SELECT priority, yr, CAST(SUM(cnt_gv) AS BIGINT) AS n_g
  FROM cells GROUP BY 1, 2
), gvals AS (
  SELECT status, CAST(SUM(cnt_gv) AS BIGINT) AS cnt_v FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(SUM(cnt_v) AS BIGINT) AS n_total FROM gvals
), full_grid AS (
  SELECT g.priority, g.yr, g.n_g, v.status, v.cnt_v,
         COALESCE(c.cnt_gv, 0) AS cnt_gv
  FROM grp g CROSS JOIN gvals v
  LEFT JOIN cells c
    ON c.priority IS NOT DISTINCT FROM g.priority
   AND c.yr IS NOT DISTINCT FROM g.yr
   AND c.status IS NOT DISTINCT FROM v.status
), per_group AS (
  SELECT priority, yr, n_g,
         SUM(ABS(CAST(cnt_gv AS DECIMAL(18,0)) * CAST(n_total AS DECIMAL(18,0))
                 - CAST(cnt_v AS DECIMAL(18,0)) * CAST(n_g AS DECIMAL(18,0))))
           AS tvd_num,
         MAX(n_total) AS n_total
  FROM full_grid CROSS JOIN tot
  GROUP BY 1, 2, 3
)
SELECT priority, yr, n_g AS n_rows,
       ROUND(CAST(tvd_num AS DOUBLE) / (2.0 * n_g * n_total), 6) AS t_distance,
       ROUND(CAST(tvd_num AS DOUBLE) / (2.0 * n_g * n_total), 6)
         > {_T_CLOSE_THRESHOLD} AS breaches_t
FROM per_group
ORDER BY priority, yr
"""


# ---------------------------------------------------------------------------
# License-taint propagation through duplicate clusters — the compliance
# twin of exact dedup. If a document from a restricted-license source has
# byte-identical copies under permissive sources, every copy carries the
# restriction: "my source is clean" is not a defense when the CONTENT is
# restricted. Cluster = md5(text) (the dedup_exact partition); a cluster
# is tainted iff ANY member's source is restricted; the audit reports,
# per source, how many of its docs sit in tainted clusters and how many
# of those are contamination-by-duplication (the doc's own source is
# permissive but a dup copy is restricted).
#
# Scale: groupBy(md5) taint bit + broadcast-back join on md5 + one
# source aggregate — two content-hash shuffles, the exact-dedup shape;
# no pairs, no graph needed (exact clusters are equivalence classes by
# construction). Restricted set is a Python literal pasted into both
# engines. All outputs are exact integer counts + one division.
# ---------------------------------------------------------------------------
_RESTRICTED_SOURCES = ("src3", "src7", "src13")


def q_governance_license_taint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text gives md5 = NULL, and a null-unsafe cluster join would drop
    # exactly the malformed rows a compliance audit must still count.
    # content_cluster_hash: each NULL-text doc is its own singleton cluster
    # (absent content is no evidence of duplication) — the SAME cluster key
    # the split-leakage audit uses, by shared definition.
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", content_cluster_hash().alias("chash")
    )
    restricted = F.col("source").isin(*_RESTRICTED_SOURCES)
    clusters = d.groupBy("chash").agg(
        F.max(restricted.cast("int")).alias("tainted")
    )
    tagged = d.join(clusters, "chash").select(
        "source",
        restricted.cast("long").alias("own_restricted"),
        F.col("tainted").cast("long").alias("tainted"),
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tainted").alias("n_tainted"),
            F.sum(
                F.when(
                    (F.col("tainted") == 1) & (F.col("own_restricted") == 0), 1
                ).otherwise(0)
            ).alias("n_contaminated_by_dup"),
            F.round(
                F.sum("tainted") * 100.0 / F.count("*"), 4
            ).alias("pct_tainted"),
        )
        .orderBy("source")
    )


_SQL_RESTRICTED = "('" + "','".join(_RESTRICTED_SOURCES) + "')"

ORACLE_GOVERNANCE_LICENSE_TAINT = f"""
WITH d AS (
  SELECT doc_id, source,
         {content_cluster_hash_sql()} AS chash,
         CASE WHEN source IN {_SQL_RESTRICTED} THEN 1 ELSE 0 END AS own_restricted
  FROM documents
), clusters AS (
  SELECT chash, MAX(own_restricted) AS tainted FROM d GROUP BY 1
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tainted) AS BIGINT) AS n_tainted,
       CAST(SUM(CASE WHEN tainted = 1 AND own_restricted = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated_by_dup,
       ROUND(SUM(tainted) * 100.0 / COUNT(*), 4) AS pct_tainted
FROM d JOIN clusters USING (chash)
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Schema/contract drift audit: the data-contract check a pipeline runs
# when a NEW batch lands next to the accepted corpus — per column-level
# metric and per event_type, do the two slices agree on volume, entity
# reach, null discipline, and value mass? (corpus_drift_psi answers the
# distribution question for documents; this is the column-stats contract
# for the events feed — the thing that catches "the producer silently
# started sending value in cents" or "user_id went nullable".)
#
# The two slices are deterministic halves (event_id parity — a stand-in
# for yesterday/today). Float discipline: value mass is per-element
# half-up integer quantization (floor(v·100 + .5) as BIGINT) summed
# exactly; every ratio is ONE try_divide of exact integers (a half can
# be empty in a degenerate slice → NULL, DuckDB-identical), round 6.
# Scale: one groupBy (type, half) over the scan, then a 2-way pivot of a
# bounded per-type frame — nothing else touches the data.
# ---------------------------------------------------------------------------
def q_dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.col("event_id"), F.lit(2)).alias("half"),
        "user_id",
        "props",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vcents"),
    )
    per = e.groupBy("event_type", "half").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("props").isNull().cast("long")).alias("n_null_props"),
        F.sum("vcents").alias("vmass"),
    )
    a = F.when(F.col("half") == 0, F.col("n"))
    b = F.when(F.col("half") == 1, F.col("n"))
    pivoted = per.groupBy("event_type").agg(
        F.sum(a).alias("n_a"),
        F.sum(b).alias("n_b"),
        F.sum(F.when(F.col("half") == 0, F.col("n_users"))).alias("users_a"),
        F.sum(F.when(F.col("half") == 1, F.col("n_users"))).alias("users_b"),
        F.sum(F.when(F.col("half") == 0, F.col("n_null_props"))).alias(
            "null_props_a"
        ),
        F.sum(F.when(F.col("half") == 1, F.col("n_null_props"))).alias(
            "null_props_b"
        ),
        F.sum(F.when(F.col("half") == 0, F.col("vmass"))).alias("vmass_a"),
        F.sum(F.when(F.col("half") == 1, F.col("vmass"))).alias("vmass_b"),
    )
    return pivoted.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(F.try_divide(F.col("n_b"), F.col("n_a")), 6).alias(
            "count_ratio"
        ),
        "users_a",
        "users_b",
        "null_props_a",
        "null_props_b",
        "vmass_a",
        "vmass_b",
        F.round(F.try_divide(F.col("vmass_b"), F.col("vmass_a")), 6).alias(
            "vmass_ratio"
        ),
    ).orderBy("event_type")


ORACLE_DQ_SCHEMA_DRIFT = """
WITH e AS (
  SELECT event_type,
         ((event_id % 2) + 2) % 2 AS half,
         user_id, props,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vcents
  FROM events
), per AS (
  SELECT event_type, half,
         COUNT(*) AS n,
         COUNT(DISTINCT user_id) AS n_users,
         SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS n_null_props,
         SUM(vcents) AS vmass
  FROM e GROUP BY 1, 2
), p AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN half = 0 THEN n END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN half = 1 THEN n END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN half = 0 THEN n_users END) AS BIGINT) AS users_a,
         CAST(SUM(CASE WHEN half = 1 THEN n_users END) AS BIGINT) AS users_b,
         CAST(SUM(CASE WHEN half = 0 THEN n_null_props END) AS BIGINT)
           AS null_props_a,
         CAST(SUM(CASE WHEN half = 1 THEN n_null_props END) AS BIGINT)
           AS null_props_b,
         CAST(SUM(CASE WHEN half = 0 THEN vmass END) AS BIGINT) AS vmass_a,
         CAST(SUM(CASE WHEN half = 1 THEN vmass END) AS BIGINT) AS vmass_b
  FROM per GROUP BY 1
)
SELECT event_type, n_a, n_b,
       ROUND(n_b / (n_a * 1.0), 6) AS count_ratio,
       users_a, users_b, null_props_a, null_props_b, vmass_a, vmass_b,
       ROUND(vmass_b / (vmass_a * 1.0), 6) AS vmass_ratio
FROM p
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Differential-privacy contribution bounds: the report a DP release
# computes BEFORE adding noise. User-level DP (DP-SGD data prep, private
# aggregation) requires clipping each user's contribution count to a
# bound C; the bound is chosen from the exact contribution histogram —
# too low destroys signal, too high inflates sensitivity (and thus the
# noise). Per event_type: user count, max/median/p99 contribution
# (EXACT order statistics via cumulative counts — no percentile_approx,
# no interpolation), and what fraction of total event mass clipping at
# C = p99 would discard.
#
# Everything is integer arithmetic until the single final division:
# p50/p99 are "smallest contribution c with 2·cum ≥ total" /
# "100·cum ≥ 99·total" — identical comparisons on both engines.
# Scale shape: one data-scaled groupBy (type, user), then a count-of-
# counts histogram (O(distinct contribution levels) rows — hundreds at
# any corpus size); the cumulative window runs over that bounded
# histogram, partitioned by event_type.
# ---------------------------------------------------------------------------
def q_dp_contribution_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP clipping-bound report per event_type: exact contribution
    order statistics (max/p50/p99 via integer cumulative counts) and
    the event mass a clip at C = p99 would discard."""
    e = load_table(spark, sf_dir, "events")
    contrib = e.groupBy("event_type", "user_id").agg(
        F.count("*").alias("c")
    )
    hist = contrib.groupBy("event_type", "c").agg(
        F.count("*").alias("n_users_c")
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("event_type")
    h = hist.select(
        "event_type",
        "c",
        "n_users_c",
        F.sum("n_users_c").over(wcum).alias("cum_users"),
        F.sum("n_users_c").over(wall).alias("tot_users"),
    )
    per_type = h.groupBy("event_type").agg(
        F.max("tot_users").alias("n_users"),
        F.max("c").alias("max_contrib"),
        F.min(
            F.when(F.col("cum_users") * 2 >= F.col("tot_users"), F.col("c"))
        ).alias("p50_contrib"),
        F.min(
            F.when(
                F.col("cum_users") * 100 >= F.col("tot_users") * 99, F.col("c")
            )
        ).alias("p99_contrib"),
        F.sum(F.col("c") * F.col("n_users_c")).alias("total_mass"),
    )
    # mass lost to clipping at C = p99: Σ_{c > C} (c − C)·n_users_c
    lost = (
        h.join(
            per_type.select("event_type", "p99_contrib"), "event_type"
        )
        .filter(F.col("c") > F.col("p99_contrib"))
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("c") - F.col("p99_contrib")) * F.col("n_users_c")
            ).alias("clipped_mass")
        )
    )
    return (
        per_type.join(lost, "event_type", "left")
        .select(
            "event_type",
            "n_users",
            "max_contrib",
            "p50_contrib",
            "p99_contrib",
            "total_mass",
            F.coalesce(F.col("clipped_mass"), F.lit(0)).alias("clipped_mass"),
            F.round(
                F.try_divide(
                    F.coalesce(F.col("clipped_mass"), F.lit(0)) * 100.0,
                    F.col("total_mass"),
                ),
                4,
            ).alias("pct_mass_clipped"),
        )
        .orderBy("event_type")
    )


ORACLE_DP_CONTRIBUTION_BOUNDS = """
WITH contrib AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), hist AS (
  SELECT event_type, c, COUNT(*) AS n_users_c
  FROM contrib GROUP BY 1, 2
), h AS (
  SELECT event_type, c, n_users_c,
         SUM(n_users_c) OVER (PARTITION BY event_type ORDER BY c
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_users,
         SUM(n_users_c) OVER (PARTITION BY event_type) AS tot_users
  FROM hist
), per_type AS (
  SELECT event_type,
         CAST(MAX(tot_users) AS BIGINT) AS n_users,
         CAST(MAX(c) AS BIGINT) AS max_contrib,
         CAST(MIN(CASE WHEN cum_users * 2 >= tot_users THEN c END) AS BIGINT)
           AS p50_contrib,
         CAST(MIN(CASE WHEN cum_users * 100 >= tot_users * 99 THEN c END)
              AS BIGINT) AS p99_contrib,
         CAST(SUM(c * n_users_c) AS BIGINT) AS total_mass
  FROM h GROUP BY 1
), lost AS (
  SELECT h.event_type,
         CAST(SUM((h.c - p.p99_contrib) * h.n_users_c) AS BIGINT)
           AS clipped_mass
  FROM h JOIN per_type p ON h.event_type = p.event_type
  WHERE h.c > p.p99_contrib
  GROUP BY 1
)
SELECT p.event_type, p.n_users, p.max_contrib, p.p50_contrib, p.p99_contrib,
       p.total_mass,
       COALESCE(l.clipped_mass, 0) AS clipped_mass,
       ROUND(COALESCE(l.clipped_mass, 0) * 100.0 / NULLIF(p.total_mass, 0), 4)
         AS pct_mass_clipped
FROM per_type p LEFT JOIN lost l ON p.event_type = l.event_type
ORDER BY p.event_type
"""


QUERIES = {
    "privacy_kanonymity": q_privacy_kanonymity,
    "privacy_ldiversity": q_privacy_ldiversity,
    "dq_benford": q_dq_benford,
    "gdpr_cascade": q_gdpr_cascade,
    "privacy_generalization_ladder": q_privacy_generalization_ladder,
    "privacy_tcloseness": q_privacy_tcloseness,
    "governance_license_taint": q_governance_license_taint,
    "dq_schema_drift": q_dq_schema_drift,
    "dp_contribution_bounds": q_dp_contribution_bounds,
}

ORACLES = {
    "privacy_kanonymity": ORACLE_PRIVACY_KANONYMITY,
    "privacy_ldiversity": ORACLE_PRIVACY_LDIVERSITY,
    "dq_benford": ORACLE_DQ_BENFORD,
    "gdpr_cascade": ORACLE_GDPR_CASCADE,
    "privacy_generalization_ladder": ORACLE_PRIVACY_GENERALIZATION_LADDER,
    "privacy_tcloseness": ORACLE_PRIVACY_TCLOSENESS,
    "governance_license_taint": ORACLE_GOVERNANCE_LICENSE_TAINT,
    "dq_schema_drift": ORACLE_DQ_SCHEMA_DRIFT,
    "dp_contribution_bounds": ORACLE_DP_CONTRIBUTION_BOUNDS,
}
