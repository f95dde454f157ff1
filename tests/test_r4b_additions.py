"""Semantic tests for the second batch of round-4 additions
(interval-overlap join, ACF, neighbor-Jaccard, key-skew profile) — the
oracle gate proves cross-engine equality; these pin what the operators
MEAN on constructed micro-data or against an independent third
implementation (numpy / brute force)."""

from __future__ import annotations

import duckdb
import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# interval overlap join
# ---------------------------------------------------------------------------
def test_interval_overlap_join_exact_pairs_no_dupes(spark):
    from log_agent_spark.operators.temporal import interval_overlap_join

    # grid = 10 s; the first left interval spans 4 cells and overlaps r1 in
    # THREE common cells — the first-common-cell rule must emit it once.
    left = spark.createDataFrame(
        [(1, 0, 35), (2, 50, 55), (3, 100, 100)], "lid long, s long, e long"
    )
    right = spark.createDataFrame(
        [(10, 5, 90), (20, 36, 49), (30, 200, 210)],
        "rid long, s long, e long",
    )
    pairs = {
        (r.l_lid, r.r_rid)
        for r in interval_overlap_join(
            left, right, "s", "e", "s", "e", bucket_s=10
        ).collect()
    }
    # (1,10): overlap [5,35]; (2,10): [50,55]; (1,20)/(2,20): disjoint
    # ([36,49] starts after 35, ends before 50); (3,*): no overlap.
    assert pairs == {(1, 10), (2, 10)}
    # multiplicity check: each pair exactly once despite multi-cell spans
    rows = interval_overlap_join(
        left, right, "s", "e", "s", "e", bucket_s=10
    ).groupBy("l_lid", "r_rid").count().collect()
    assert all(r["count"] == 1 for r in rows)


def test_interval_overlap_join_inclusive_bounds(spark):
    from log_agent_spark.operators.temporal import interval_overlap_join

    # touching endpoints ARE overlaps (closed intervals), even across a
    # grid-cell boundary
    left = spark.createDataFrame([(1, 0, 10)], "lid long, s long, e long")
    right = spark.createDataFrame([(2, 10, 20)], "rid long, s long, e long")
    got = interval_overlap_join(
        left, right, "s", "e", "s", "e", bucket_s=10
    ).collect()
    assert len(got) == 1


# ---------------------------------------------------------------------------
# autocorrelation vs an independent numpy implementation
# ---------------------------------------------------------------------------
def test_ts_autocorrelation_matches_numpy(spark):
    import __spark_entry__ as entry

    got = {
        (r.event_type, r.lag): (r.acf, r.n_days)
        for r in entry.queries()["ts_autocorrelation"](spark, SF).collect()
    }
    daily = duckdb.sql(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    for etype, g in daily.groupby("event_type"):
        days = g["day"].to_numpy().astype("datetime64[D]")
        spine = np.arange(days.min(), days.max() + np.timedelta64(1, "D"))
        x = np.zeros(len(spine), dtype=np.int64)
        x[np.searchsorted(spine, days)] = g["cnt"].to_numpy()
        n = len(x)
        xbar = x.mean()
        den = ((x - xbar) ** 2).sum()
        for k in range(1, 8):
            ref = ((x[:-k] - xbar) * (x[k:] - xbar)).sum() / den
            acf, n_days = got[(etype, k)]
            assert n_days == n
            assert abs(acf - ref) < 2e-6, (etype, k, acf, ref)


def test_ts_autocorrelation_flat_series_yields_null_not_crash(spark, tmp_path):
    """A zero-variance (flat) daily series makes the n²-scaled denominator
    exactly 0. DuckDB yields NULL for division by zero; Spark's ANSI
    default (on in the driver's vanilla 4.x session) used to crash the
    whole query with DIVIDE_BY_ZERO — try_divide must return NULL rows."""
    import datetime as dt

    import __spark_entry__ as entry

    rows = [
        ("flat", dt.datetime(2024, 1, d, h, 0, 0))
        for d in (1, 2, 3)
        for h in (9, 17)  # exactly 2 events on each of 3 days
    ]
    spark.createDataFrame(
        rows, "event_type string, ts timestamp"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = entry.queries()["ts_autocorrelation"](spark, str(tmp_path)).collect()
    assert {r.event_type for r in got} == {"flat"}
    assert {r.lag for r in got} == set(range(1, 8))
    for r in got:
        assert r.acf is None
        assert r.n_days == 3


# ---------------------------------------------------------------------------
# neighbor-set Jaccard vs brute force
# ---------------------------------------------------------------------------
def test_graph_jaccard_matches_bruteforce(spark):
    import collections

    import __spark_entry__ as entry
    from log_agent_spark.operators.graph import _lpa_edges

    rows = entry.queries()["graph_jaccard_neighbors"](spark, SF).collect()
    assert rows, "fixture graph should yield candidate pairs"
    nbrs = collections.defaultdict(set)
    for e in _lpa_edges(spark, SF).collect():
        nbrs[e.u].add(e.v)
        nbrs[e.v].add(e.u)
    prev = None
    for r in rows:
        assert r.a < r.b
        inter = nbrs[r.a] & nbrs[r.b]
        union = nbrs[r.a] | nbrs[r.b]
        assert r.common_nbrs == len(inter)
        assert r.union_nbrs == len(union)
        assert abs(r.jaccard - len(inter) / len(union)) < 1e-6
        raw = r.common_nbrs / r.union_nbrs
        if prev is not None:
            assert raw <= prev + 1e-12, "not sorted by jaccard desc"
        prev = raw


def test_jaccard_hub_cap_bounds_wedges(spark):
    """Planted hub: a star of degree 3×CAP must contribute at most
    CAP·(CAP-1)/2 wedges through its center, not deg²/2 — the executable
    hub mitigation behind graph_jaccard_neighbors' scale contract."""
    from log_agent_spark.operators.graph import _capped_adjacency

    cap = 8
    hub_deg = 3 * cap
    # star: center node 0 connected to 1..hub_deg, symmetrized
    edges = [(0, i) for i in range(1, hub_deg + 1)]
    sym = spark.createDataFrame(
        edges + [(v, u) for (u, v) in edges], "u long, v long"
    )
    capped = _capped_adjacency(sym, cap)
    # deterministic smallest-id selection: center 0's list is exactly 1..cap
    kept = sorted(
        r.u for r in capped.filter(F.col("v") == 0).collect()
    )
    assert kept == list(range(1, cap + 1))
    # wedge count through any center is bounded by C(cap, 2)
    a = capped.select(F.col("u").alias("a"), F.col("v").alias("c"))
    b = capped.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = (
        a.join(b, "c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("c")
        .count()
        .collect()
    )
    bound = cap * (cap - 1) // 2
    assert all(r["count"] <= bound for r in wedges)
    # the hub center hits the bound exactly (cap kept of hub_deg leaves)
    assert {r.c: r["count"] for r in wedges}[0] == bound


# ---------------------------------------------------------------------------
# key-skew profile on a constructed distribution
# ---------------------------------------------------------------------------
def test_key_profile_constructed_distribution(spark):
    from log_agent_spark.operators.skew import key_profile

    # one hot key with 10 rows + 9 singleton keys
    data = [("hot",)] * 10 + [(f"k{i}",) for i in range(9)]
    df = spark.createDataFrame(data, "key string")
    row = key_profile(df, "key", "t.key").collect()[0]
    assert row.profile == "t.key"
    assert row.n_rows == 19
    assert row.n_keys == 10
    assert row.max_cnt == 10
    # cumulative histogram: cnt=1 covers 9/10 keys → p50=1; 9*100 < 99*10
    # → p99 lands on the hot multiplicity
    assert row.p50_cnt == 1
    assert row.p99_cnt == 10
    assert abs(row.skew_ratio - round(10 * 10 / 19, 4)) < 1e-9


def test_key_profile_uniform_distribution_ratio_one(spark):
    from log_agent_spark.operators.skew import key_profile

    df = spark.createDataFrame(
        [(f"k{i % 5}",) for i in range(20)], "key string"
    )
    row = key_profile(df, "key", "u.key").collect()[0]
    assert row.n_keys == 5 and row.max_cnt == 4
    assert row.p50_cnt == 4 and row.p99_cnt == 4
    assert row.skew_ratio == 1.0
