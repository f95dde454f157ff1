"""connected_components: known-shape graphs, including a chain whose
diameter forces multiple propagation rounds."""

from pyspark.sql import functions as F

from log_agent_spark.operators.graph import connected_components


def _cc(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "src long, dst long"
    ).filter(F.col("src").isNotNull())
    out = connected_components(nodes, edges)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_chain_and_singleton(spark):
    # chain 1-2-3-4-5 (diameter 4 > 1 round), pair 10-11, singleton 20
    got = _cc(
        spark,
        [1, 2, 3, 4, 5, 10, 11, 20],
        [(1, 2), (2, 3), (3, 4), (4, 5), (11, 10)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_cycle_merges_to_min(spark):
    got = _cc(spark, [7, 8, 9], [(7, 8), (8, 9), (9, 7)])
    assert got == {7: 7, 8: 7, 9: 7}


def test_no_edges_identity(spark):
    got = _cc(spark, [3, 1, 2], [])
    assert got == {1: 1, 2: 2, 3: 3}
