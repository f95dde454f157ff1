"""Hub-capped basket→pair edge generation, shared by every consumer of the
order co-purchase projection (graph family + market-basket analytics).

The pathology (measured, tools/skew_probe.py): a keyed self-join on a
basket key (``l_orderkey``) emits C(b, 2) rows for a basket of b items —
a per-key quadratic that NO partition strategy can split, because all
C(b, 2) rows come from one join key. A planted 1,200-item mega order cost
graph_triangle_count a 2.24× skew ratio before the cap and 0.79× after
(SKEW.md). Round 7 valved only triangle counting; round 8 lifts the valve
into this shared builder so all seven basket-pair consumers
(graph_triangle_count, graph_label_propagation, graph_kcore,
graph_modularity, graph_degree_powerlaw, graph_jaccard_neighbors,
basket_part_pairs_lift) are bounded by C(cap, 2) edges per basket.

Semantics: keep the ``cap`` smallest items of each basket (deterministic
truncation — both engines select the identical sublist), a documented
approximation for super-baskets only. BASKET_CAP = 512 is ~70× TPC-H's
max basket of 7, so every driver fixture passes through untruncated; the
DuckDB oracles mirror the truncation verbatim via :func:`capped_pp_sql`,
so they remain exact mirrors at ANY scale, not just below the cap.

Truncation is observable, not silent (ADVICE r7): an ``observe()`` metric
counts dropped rows in-plan (a CollectMetrics node — zero extra Spark
jobs; visible to any QueryExecutionListener and in the Spark UI), so an
approximate result at super-basket scale is identifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# ~70× TPC-H's max basket of 7: a pathology valve, not a sampling knob.
BASKET_CAP = 512


def capped_basket_items(
    df: DataFrame,
    key: str = "l_orderkey",
    item: str = "l_partkey",
    cap: int = BASKET_CAP,
    observation=None,
) -> DataFrame:
    """Truncate each basket to its ``cap`` smallest ``item``s.

    ``df`` must hold distinct (key, item) pairs, so ORDER BY item is a
    total order within a basket and the kept sublist is deterministic.
    The row_number window partitions on the SAME key as the self-join
    every consumer runs next, so Catalyst feeds that join straight from
    the window's exchange — the cap costs a sort within partitions, not
    an extra shuffle (verified in the triangle plan, PLANS.md).

    Pass a ``pyspark.sql.Observation`` as ``observation`` to read the
    truncation counters directly after the first action
    (``obs.get["truncated_rows"]``); by default the metrics publish
    under a string name (Spark UI / QueryExecutionListener).
    """
    ranked = df.withColumn(
        "__basket_rn", F.row_number().over(W.partitionBy(key).orderBy(item))
    )
    # In-plan truncation counter (no extra job): rows with rn > cap are
    # exactly the dropped ones. Metric name carries the key so composed
    # plans with two capped builders on different keys don't collide.
    ranked = ranked.observe(
        observation if observation is not None else f"basket_cap:{key}",
        F.sum(
            F.when(F.col("__basket_rn") > cap, F.lit(1)).otherwise(F.lit(0))
        ).alias("truncated_rows"),
        # distinct aggregates are disallowed in observed metrics; each
        # truncated basket contributes exactly one row with rn == cap + 1
        F.sum(
            F.when(F.col("__basket_rn") == cap + 1, F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("truncated_baskets"),
    )
    return ranked.filter(F.col("__basket_rn") <= cap).drop("__basket_rn")


def capped_pp_sql(
    cap: int = BASKET_CAP,
    table: str = "lineitem",
    key: str = "l_orderkey",
    item: str = "l_partkey",
) -> str:
    """DuckDB CTE body mirroring :func:`capped_basket_items` over the
    DISTINCT (key, item) projection of ``table`` — drop-in replacement for
    the old ``SELECT DISTINCT l_orderkey, l_partkey FROM lineitem`` CTE in
    every basket-pair oracle, so oracle and engine truncate identically."""
    return f"""
  SELECT {key}, {item} FROM (
    SELECT {key}, {item},
           ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY {item}) AS rn
    FROM (SELECT DISTINCT {key}, {item} FROM {table})
  ) WHERE rn <= {cap}
"""
