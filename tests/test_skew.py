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


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's skew-join split: a partition dominated by one hot key is split
    into advisory-sized sub-reads at runtime — the built-in complement to
    the manual salting above (salting pre-commits the plan; AQE fixes skew
    it discovers). Caveat captured here: the split only fires when the join
    feeds no distribution-requiring operator (an agg right after the join
    suppresses it unless forceOptimizeSkewedJoin accepts the extra
    shuffle)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k",
            "id AS v",
            "repeat('x', 64) AS pad",
        )
        right = spark.range(0, 1000).selectExpr("id AS k", "id AS w")
        j = left.join(right, "k")
        rows = j.collect()  # drives THIS DataFrame's QueryExecution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        # 180k hot-key rows + 100 long-tail matches, all intact post-split
        assert len(rows) == 180_100
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pairgen_profile_cap_math(spark):
    """Pin the C(n,2) radar arithmetic: a 600-item key crosses the 512
    cap (1 key over, pair mass 600*599/2, capped mass 512*511/2) and the
    hot key's share rounds to ~1.0 against a 1-pair long tail."""
    from log_agent_spark.operators.skew import pairgen_profile

    per_key = spark.createDataFrame([(1, 600), (2, 2)], ["k", "n"]).select("n")
    row = pairgen_profile(per_key, "synthetic").collect()[0]
    assert row.source == "synthetic"
    assert row.n_keys == 2 and row.max_n == 600
    assert row.pair_mass == 600 * 599 // 2 + 1
    assert row.keys_over_cap == 1
    assert row.capped_pair_mass == 512 * 511 // 2 + 1
    assert row.top_pair_share == 1.0  # 179700/179701 rounds to 1.0
    assert row.cap == 512  # self-describing: which valve this row measures


def test_pairgen_profile_takes_the_legs_own_cap(spark):
    """ADVICE r8: each radar leg measures ITS valve's cap — the attribution
    leg runs at _ATTR_DAY_CLICK_CAP=32, not the basket 512."""
    from log_agent_spark.operators.skew import pairgen_profile
    from log_agent_spark.plans.events import _ATTR_DAY_CLICK_CAP

    per_key = spark.createDataFrame([(1, 40), (2, 2)], ["k", "n"]).select("n")
    row = pairgen_profile(per_key, "clicks", cap=_ATTR_DAY_CLICK_CAP).collect()[0]
    assert row.cap == 32
    assert row.keys_over_cap == 1  # 40 > 32, invisible to a 512 cap
    assert row.capped_pair_mass == 32 * 31 // 2 + 1


def test_radar_gate_flags_unacked_hot_source():
    """VERDICT r8 item 5: keys_over_cap > 0 on a source with no RADAR_ACK
    entry must gate; acked or cold sources must not. Pure — no Spark."""
    import importlib

    probe = importlib.import_module("tools.skew_probe")
    rows = [
        # acked + hot: fine (the valve is the acknowledgment)
        {"source": "lineitem.l_orderkey basket", "cap": 512, "max_n": 12000,
         "keys_over_cap": 1, "pair_mass": 9, "capped_pair_mass": 5},
        # unacked + cold: fine (nothing crossed the cap)
        {"source": "brand-new pair space", "cap": 512, "max_n": 10,
         "keys_over_cap": 0, "pair_mass": 45, "capped_pair_mass": 45},
        # unacked + hot: MUST flag
        {"source": "brand-new hot pair space", "cap": 512, "max_n": 9000,
         "keys_over_cap": 3, "pair_mass": 9, "capped_pair_mass": 5},
    ]
    bad = probe.radar_violations(rows)
    assert len(bad) == 1 and "brand-new hot pair space" in bad[0]
    # every radar leg the engine actually emits is acknowledged
    assert set(probe.RADAR_ACK) == {
        "lineitem.l_orderkey basket",
        "events clicks per (user_id, day)",
        "documents dup-cluster (what-if)",
    }


def test_pairgen_profile_empty_domain_is_zero_not_null(spark):
    from log_agent_spark.operators.skew import pairgen_profile

    per_key = spark.createDataFrame([], "n long")
    row = pairgen_profile(per_key, "empty").collect()[0]
    assert row.n_keys == 0
    assert row.top_pair_share == 0.0
