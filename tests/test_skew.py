"""Salting utilities stay exact: salted plans ≡ their direct equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_agent_spark.operators.skew import salted_count_distinct, salted_join


def test_salted_count_distinct_exact(spark):
    # one pathologically hot key: 'hot' holds 500 rows over 100 distinct vals
    rows = [("hot", i % 100) for i in range(500)] + [("cold", i) for i in range(7)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: r.n_distinct
        for r in salted_count_distinct(df, ["k"], "v", buckets=8).collect()
    }
    assert got == {"hot": 100, "cold": 7}


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [("a", i) for i in range(200)] + [("b", i) for i in range(5)], ["k", "lv"]
    )
    right = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], ["k", "rv"])
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, ["k"], buckets=4).collect()}
    assert salted == plain
    # every row of the hot key survived exactly once
    assert len([t for t in salted if t[0] == "a"]) == 200


def test_salted_join_spreads_hot_key(spark):
    left = spark.createDataFrame([("a", i) for i in range(64)], ["k", "lv"])
    right = spark.createDataFrame([("a", 1)], ["k", "rv"])
    salts = (
        left.withColumn("_salt", F.pmod(F.xxhash64("k", "lv"), F.lit(8)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 1  # the hot key fans out across salt buckets
