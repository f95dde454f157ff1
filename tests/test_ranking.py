"""operators/ranking.py invariants: the distributed global rank / cumsum /
ntile must be value-identical to the single-task window forms they replace
(customer_rfm, pareto, zipf — VERDICT r1 findings 8-10), including ties,
n < k, and empty inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from log_agent_spark.operators.ranking import exact_ntile, with_global_order


@pytest.fixture(scope="module")
def frame(spark):
    # values with heavy ties (v = id % 7) so tie-break order matters
    return spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )


def test_global_rank_matches_window(frame):
    got = with_global_order(frame, [F.asc("v"), F.asc("id")], rank_col="r")
    want = frame.withColumn(
        "r", F.row_number().over(W.orderBy(F.asc("v"), F.asc("id")))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_global_cumsum_matches_window(frame):
    got = with_global_order(
        frame,
        [F.desc("v"), F.asc("id")],
        rank_col="r",
        cumsum_of=F.col("id"),
        cumsum_col="c",
    )
    w = W.orderBy(F.desc("v"), F.asc("id"))
    want = frame.withColumn("r", F.row_number().over(w)).withColumn(
        "c", F.sum("id").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.parametrize("n,k", [(500, 4), (10, 3), (3, 4), (7, 7), (1, 2)])
def test_exact_ntile_matches_window(spark, n, k):
    df = spark.range(0, n).select(
        F.col("id"), (F.col("id") % 5).alias("v")
    )
    got = exact_ntile(df, k, [F.asc("v"), F.asc("id")], "t")
    want = df.withColumn(
        "t",
        F.ntile(k).over(W.orderBy(F.asc("v"), F.asc("id"))).cast("long"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id"), F.col("id").alias("v"))
    assert with_global_order(df, [F.asc("v")], rank_col="r").count() == 0
    assert exact_ntile(df, 4, [F.asc("v")], "t").count() == 0


def test_rank_keys_only_projection(spark):
    df = spark.range(0, 50).select(F.col("id"), (F.col("id") % 3).alias("v"))
    out = exact_ntile(
        df, 4, [F.desc("v"), F.asc("id")], "q", key_cols=["id"]
    )
    assert out.columns == ["id", "q"]
    assert out.count() == 50


@pytest.mark.parametrize(
    "n,qs",
    [
        (500, [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]),
        (10, [0.0, 0.5, 1.0]),
        (1, [0.25, 0.5, 0.75]),
        (97, [1.0 / 3.0, 2.0 / 3.0]),  # irrational-ish interpolation points
    ],
)
def test_exact_percentiles_matches_builtin(spark, n, qs):
    # heavy ties + non-integer values so interpolation arithmetic matters;
    # the distributed form must be BIT-identical to Spark's Percentile
    # aggregate (same operand order in the interpolation formula).
    from log_agent_spark.operators.ranking import exact_percentiles

    df = spark.range(0, n).select(
        ((F.col("id") % 13).cast("double") * 1.37 + 0.001).alias("v")
    )
    got = {
        r["q"]: r["value"]
        for r in exact_percentiles(df, F.col("v"), qs).collect()
    }
    arr = ", ".join(f"{q!r}D" for q in qs)
    want_row = df.agg(
        F.expr(f"percentile(v, array({arr}))").alias("p")
    ).collect()[0]["p"]
    assert len(got) == len(qs)
    for q, w in zip(qs, want_row):
        assert got[q] == w, (q, got[q], w)  # exact equality, not approx


def test_exact_percentiles_empty_and_nulls(spark):
    from log_agent_spark.operators.ranking import exact_percentiles

    empty = spark.range(0).select(F.col("id").cast("double").alias("v"))
    assert exact_percentiles(empty, F.col("v"), [0.5]).count() == 0
    # NULLs dropped first, like the aggregate
    withnull = spark.createDataFrame(
        [(1.0,), (None,), (3.0,)], "v double"
    )
    out = {
        r["q"]: r["value"]
        for r in exact_percentiles(withnull, F.col("v"), [0.5]).collect()
    }
    assert out == {0.5: 2.0}
