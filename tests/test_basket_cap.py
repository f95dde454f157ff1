"""Shared basket hub valve (log_agent_spark/baskets.py).

Round-7 verdict item 1: the C(b,2)-per-key quadratic was valved only in
triangle counting; the valve now lives in one shared builder feeding all
seven basket-pair consumers. These tests pin (a) the truncation
semantics (cap smallest items, deterministic, identity below the cap),
(b) the SQL mirror selecting the identical sublist, and (c) the
observability contract — truncation emits an in-plan CollectMetrics
counter instead of silently approximating (ADVICE r7).
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from log_agent_spark.baskets import (
    BASKET_CAP,
    capped_basket_items,
    capped_pp_sql,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])


def test_identity_below_cap(spark):
    rows = [(o, i) for o in range(5) for i in range(7)]  # TPC-H-max baskets
    df = _pairs(spark, rows)
    out = sorted(map(tuple, capped_basket_items(df).collect()))
    assert out == sorted(rows)


def test_truncates_to_cap_smallest_items(spark):
    rows = [(1, i) for i in range(10)] + [(2, 100), (2, 101)]
    df = _pairs(spark, rows)
    out = sorted(map(tuple, capped_basket_items(df, cap=4).collect()))
    assert out == [(1, 0), (1, 1), (1, 2), (1, 3), (2, 100), (2, 101)]


def test_sql_mirror_selects_identical_sublist(spark, tmp_path):
    # super-basket of BASKET_CAP + 50 items plus honest baskets; both
    # engines must keep byte-identical (key, item) sets at the REAL cap
    rows = [(9, i * 3) for i in range(BASKET_CAP + 50)]
    rows += [(o, i) for o in range(3) for i in range(5)]
    df = _pairs(spark, rows)
    spark_out = sorted(map(tuple, capped_basket_items(df).collect()))
    path = str(tmp_path / "lineitem.parquet")
    df.write.parquet(path)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{path}/*.parquet'")
    duck_out = sorted(
        map(tuple, con.sql(capped_pp_sql()).fetchall())
    )
    assert spark_out == duck_out
    assert len([r for r in spark_out if r[0] == 9]) == BASKET_CAP


def test_truncation_is_observable(spark):
    # the valve must not be silent: the plan carries a CollectMetrics
    # node counting dropped rows and truncated baskets
    rows = [(1, i) for i in range(8)] + [(2, 1), (2, 2)]
    df = capped_basket_items(_pairs(spark, rows), cap=3)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "basket_cap:l_orderkey" in analyzed
    assert "truncated_rows" in analyzed and "truncated_baskets" in analyzed
    # semantics stay correct alongside the metric
    assert df.count() == 3 + 2


def test_consumers_route_through_the_shared_valve():
    """Every basket-pair consumer named in VERDICT r7 item 1 must build
    its pair join from the capped builder (source-level pin so a future
    refactor can't quietly reintroduce the uncapped self-join)."""
    import inspect

    from log_agent_spark.operators import graph
    from log_agent_spark.plans import analytics

    assert "capped_basket_items" in inspect.getsource(graph._lpa_edges)
    assert "capped_basket_items" in inspect.getsource(
        graph.q_graph_triangle_count
    )
    assert "capped_basket_items" in inspect.getsource(
        analytics.q_basket_part_pairs_lift
    )
    # and each consumer's oracle mirrors the cap
    for name in (
        "graph_triangle_count",
        "graph_label_propagation",
        "graph_kcore",
        "graph_modularity",
        "graph_degree_powerlaw",
        "graph_jaccard_neighbors",
    ):
        assert f"rn <= {BASKET_CAP}" in graph.ORACLES[name], name
    assert f"rn <= {BASKET_CAP}" in analytics.ORACLE_BASKET_PART_PAIRS_LIFT


def test_truncation_counters_readable_via_observation(spark):
    """The identifiability contract end-to-end (not just a plan-string
    check): an Observation handed to the builder returns the exact
    dropped-row and truncated-basket counts after the first action."""
    from pyspark.sql import Observation

    rows = [(1, i) for i in range(8)] + [(2, 1), (2, 2)]
    obs = Observation("basket_cap_test")
    df = capped_basket_items(_pairs(spark, rows), cap=3, observation=obs)
    assert df.count() == 5
    got = obs.get
    assert got["truncated_rows"] == 5  # rn 4..8 of basket 1
    assert got["truncated_baskets"] == 1
