"""Partition-layout independence: the determinism SCALE.md promises.

Every query is supposed to produce identical VALUES regardless of how the
data is partitioned — that is what makes task retries, speculative
execution, AQE re-planning, and laptop-vs-cluster runs agree. This drives
a set of layout-sensitive queries (float folds, hash sampling, LSH
self-joins, window-heavy stats) in a sibling session with a different,
prime `spark.sql.shuffle.partitions` and a different default parallelism
hint, then requires row-for-row equality with the base session.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# Layout-sensitive representatives: each exercises a mechanism that could
# go nondeterministic (fold order, float accumulation, hash partitioning,
# self-join candidate order, windows, explode fan-out).
CASES = [
    "events_ewma_daily",          # sequential float fold
    "events_forecast_holt",       # struct-accumulator fold
    "events_trend_robust",        # pair join + hand-rolled median
    "events_seasonal_anomaly",    # integer gate + window
    "dedup_minhash_lsh",          # banded self-join
    "sample_weighted_reservoir",  # hash-keyed top-k
    "sample_bootstrap_ci",        # per-row hash draws + percentiles
    "customer_rfm",               # range-partitioned exact ntile
    "events_hll_report",          # register-level sketch
    "media_shard_manifest",       # running-sum packing
    # round-3 additions with float paths / quantized integer sums
    "corpus_drift_psi",           # 1e-9-grid integer PSI total
    "mixture_doremi_step",        # linear-MW update, 1e-12-grid normalizer
    "mixture_token_budget",       # sqrt weights, integer ceil-division
    "graph_modularity",           # decimal Σd², ratio-of-integer Q
    "embedding_dim_audit",        # decimal sums over 1e-6 grid
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_layout_independent(spark, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    base = _rows(fn(spark, SF))
    alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        got = _rows(fn(alt, SF))
    finally:
        alt.conf.unset("spark.sql.shuffle.partitions")
    assert got == base, f"{name} changed values under a different layout"
