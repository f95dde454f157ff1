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
    # round-4 additions
    "text_char_entropy",          # per-doc float log2 fold under round(4)
    "media_phash_neardup",        # integer aHash + banded join
    # round-5 additions
    "er_golden_record",           # SNM window pairs -> CC -> survivorship
    "privacy_tcloseness",         # common-denominator integer TVD
    "dq_schema_drift",            # per-element cents quantization sums
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


# ---------------------------------------------------------------------------
# Bit-identity pre-verification for the cross-engine float recipes
# (VERDICT r3 item 5): strictly stronger than the mirror's hash equality —
# after the driver's own canonicalization the Spark and DuckDB pandas
# frames must be dtype-identical and bit-identical at sf0.01 (float64
# compared on raw bit patterns, catching -0.0 vs 0.0 and ulp drift).
# ---------------------------------------------------------------------------

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"

FLOAT_RECIPE_QUERIES = [
    "mixture_doremi_step",  # linearized multiplicative weights, no exp
    "mixture_token_budget",  # sqrt alpha=0.5 temperature (IEEE-exact)
    "curriculum_quality_bins",  # distributed exact NTILE
    "sample_bootstrap_ci",  # hand-rolled (a+b)/2 percentile interpolation
    "events_ewma_daily",  # dyadic alpha=0.5 fold (bit-identical recurrence)
    # round-5 window pre-verification (VERDICT r4 item 4): the newest hash
    # recipes, frozen bit-identically BEFORE the driver window rotation
    "privacy_generalization_ladder",  # residual-group cascade, int k-checks
    "ts_autocorrelation",  # try_divide, n²-scaled integer denominator
    "label_noise_audit",  # integer-quantized SUM centroids → exact argmax
    "al_margin_sample",  # same centroid recipe, margin ordering
    "text_judge_agreement",  # Cohen kappa from integer contingency
    "events_slo_burn_rate",  # ratio-of-integer-counts burn windows
    "text_char_entropy",  # float log2 fold, -0.0 normalized, empty-doc gate
    "text_langid_fertility",  # try_divide ratio-of-integer-sums
    "embedding_drift_audit",  # per-dim decimal sums, +0.0 on means
    "ann_ndcg_report",  # Python-literal integer log2-discount gains
    "dq_benford",  # leading-digit integer histogram + chi² under round
    "privacy_tcloseness",  # integer TVD numerator, one division per group
    "governance_license_taint",  # pure integer counts over md5 clusters
    "er_match_pairs",  # integer F-S scores over SNM windows
    "er_golden_record",  # CC labels + integer-cents survivorship
    "dq_schema_drift",  # integer-cents mass ratios via try_divide
]


def _driver_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", FLOAT_RECIPE_QUERIES)
def test_float_recipe_bit_identical(spark, duck, name):
    import __spark_entry__ as entry

    spdf = _driver_canon(entry.queries()[name](spark, SF_DIR).toPandas())
    odf = _driver_canon(duck.sql(entry.oracle_sql()[name]).df())

    assert list(spdf.columns) == list(odf.columns)
    assert len(spdf) == len(odf), f"{name}: row counts differ"
    for c in spdf.columns:
        s_dtype, o_dtype = str(spdf[c].dtype), str(odf[c].dtype)
        assert s_dtype == o_dtype, f"{name}.{c}: dtype {s_dtype} != {o_dtype}"
        s, o = spdf[c].to_numpy(), odf[c].to_numpy()
        if s.dtype == np.float64:
            # raw bit patterns: catches -0.0 vs 0.0 and ulp drift that a
            # tolerance-based compare would wave through
            assert np.array_equal(
                s.view(np.int64), o.view(np.int64)
            ), f"{name}.{c}: float64 bits differ"
        else:
            assert np.array_equal(s, o), f"{name}.{c}: values differ"
