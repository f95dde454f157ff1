"""Every query that pins executor storage must release it on its own path.

VERDICT r3 "What's wrong" #1: 16 persist()/cache() calls vs 2 unpersists
repo-wide — masked by the harnesses' clearCache(), but a real long-lived
session composing these operators would leak storage blocks until eviction
pressure degrades unrelated queries. The fix is ``scratch.pinned_query``:
snapshot persistent-RDD ids, materialize the bounded result to scratch
parquet while the caches are hot, release every id the body added (RDD
level, so ``localCheckpoint`` pins are released too), return a readback.

These tests run the pinning queries back-to-back WITHOUT any clearCache and
assert the persistent-RDD map is empty after each collect — the verdict's
own done-criterion.
"""

from __future__ import annotations

import pytest

PINNING_QUERIES = [
    # graph family (persist + localCheckpoint pins)
    "graph_pagerank",
    "graph_modularity",
    "graph_label_propagation",
    "graph_kcore",
    "graph_bfs_hops",
    "dedup_connected_components",
    # dedup/similarity pins outside the graph family
    "dedup_bloom_prefilter",
    "dedup_canonical_corpus",
    "embeddings_power_iteration",
]


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize("name", PINNING_QUERIES)
def test_query_releases_all_pinned_storage(spark, sf_dir, name):
    import __spark_entry__ as entry

    q = entry.queries()[name]
    df = q(spark, sf_dir)
    assert df.count() >= 0  # consume the result like the driver does
    assert _persistent_rdd_count(spark) == 0, (
        f"{name} leaked persistent RDDs past its own collect"
    )


def test_back_to_back_graph_queries_leave_no_blocks(spark, sf_dir):
    """Two heavy graph queries composed in one session (the composition the
    harness clearCache used to mask) — nothing pinned after each."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("graph_modularity", "graph_pagerank"):
        qs[name](spark, sf_dir).collect()
        assert _persistent_rdd_count(spark) == 0, f"{name} leaked"
