"""Bit-identity pre-verification for the cross-engine float recipes.

VERDICT r3 item 5: the queries built on the transcendental/rounding
discipline (sqrt-only temperatures, linearized multiplicative weights,
dyadic alpha=0.5 folds, ratio-of-integer-sums) have never faced the real
driver. The mirror's hash equality already gates them, but a hash can
collide-by-rounding while dtypes drift; these tests assert something
strictly stronger at sf0.01: after the driver's own canonicalization, the
Spark and DuckDB pandas frames are **dtype-identical and bit-identical**
(float64 columns compared on their raw bit patterns via ``view(int64)``,
which distinguishes -0.0 from 0.0 and NaN payloads — everything the
driver's value hash could possibly see).

Uses the sf0.01 fixture (not the session-scoped sf0.001 one): these
recipes' risk is accumulation order at realistic group sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"

FLOAT_RECIPE_QUERIES = [
    "mixture_doremi_step",  # linearized multiplicative weights, no exp
    "mixture_token_budget",  # sqrt alpha=0.5 temperature (IEEE-exact)
    "curriculum_quality_bins",  # distributed exact NTILE
    "sample_bootstrap_ci",  # hand-rolled (a+b)/2 percentile interpolation
    "events_ewma_daily",  # dyadic alpha=0.5 fold (bit-identical recurrence)
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
