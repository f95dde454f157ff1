"""Independent second signals for single-driver-signal queries (VERDICT r8
item 2's other half): each of these queries is oracle-green exactly once in
the cumulative driver ledger and appears in no dedicated test. These tests
pin semantics the value hash can't articulate — conservation identities,
convexity bounds, and full Python replays computed WITHOUT Spark SQL
functions — so a regression between driver windows has a local tripwire.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from log_agent_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _q(name):
    return entrymod.queries()[name]


def test_dedup_savings_conserves_the_corpus(spark):
    """Cluster-size histogram identities: sizes×clusters == corpus size;
    removable == (size-1)×clusters per row; the planted exact copies
    guarantee a multi-doc cluster row exists."""
    from log_agent_spark.operators.dedup import with_planted_dups

    n_docs = with_planted_dups(
        load_table(spark, SF, "documents").select("doc_id", "text")
    ).count()
    rows = _q("dedup_savings")(spark, SF).collect()
    assert sum(r.cluster_size * r.n_clusters for r in rows) == n_docs
    for r in rows:
        assert r.docs_removable == (r.cluster_size - 1) * r.n_clusters
    assert any(r.cluster_size >= 2 for r in rows)


def test_corpus_datasheet_counts_are_consistent(spark):
    d = load_table(spark, SF, "documents")
    m = {r.metric: r.value for r in _q("corpus_datasheet")(spark, SF).collect()}
    assert m["n_docs"] == d.count()
    assert m["n_chars"] >= m["n_tokens"] > 0
    assert 0 < m["n_sources"] and 0 < m["n_langs"]
    # derived metrics re-derived: avg tokens and the fraction bounds
    assert abs(m["avg_doc_tokens"] - round(m["n_tokens"] / m["n_docs"], 3)) < 1e-9
    for frac in ("exact_dup_frac", "quality_pass_frac", "eval_contaminated_frac"):
        assert 0.0 <= m[frac] <= 1.0, frac


def test_gaps_islands_partition_the_active_days(spark):
    """Island property: each island spans exactly its day count, and the
    islands of a user PARTITION the user's distinct active days."""
    rows = _q("events_gaps_islands")(spark, SF).collect()
    for r in rows:
        span = (
            dt.date.fromisoformat(r.end_day) - dt.date.fromisoformat(r.start_day)
        ).days + 1
        assert r.n_days == span, r
    active_days = (
        load_table(spark, SF, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .count()
    )
    assert sum(r.n_days for r in rows) == active_days


def test_histogram_totalprice_partitions_orders(spark):
    from log_agent_spark.plans.sampling import _H_LO, _H_N, _H_W

    rows = _q("histogram_totalprice")(spark, SF).collect()
    assert sum(r.n_orders for r in rows) == load_table(spark, SF, "orders").count()
    for r in rows:
        assert r.min_price <= r.max_price
        if r.bucket == 0:
            assert r.max_price < _H_LO
        elif r.bucket <= _H_N:  # interior buckets are equi-width
            assert r.max_price - r.min_price <= _H_W


def test_epoch_projections_python_replay(spark):
    """Full independent replay: every projected column re-derived from the
    epoch-ms value with the Python datetime library (UTC session tz)."""
    rows = _q("epoch_projections")(spark, SF).collect()
    assert rows
    for r in rows:
        t = dt.datetime.fromtimestamp(r.file_time_ms / 1000.0, tz=dt.timezone.utc)
        assert r.file_date == t.strftime("%Y-%m-%d")
        assert r.hour_of_day == t.hour
        # Spark dayofweek: Sunday=1..Saturday=7; python weekday: Monday=0
        assert r.dow == (t.weekday() + 1) % 7 + 1


def test_json_extract_python_replay(spark):
    """Full independent replay of the JSON path extraction + aggregation
    with json.loads — no Spark JSON function on the replay side."""
    raw = (
        load_table(spark, SF, "events").select("event_type", "props").collect()
    )
    agg: dict[str, list] = {}
    for r in raw:
        k = None
        if r.props:
            try:
                v = json.loads(r.props).get("k")
                k = int(v) if v is not None else None
            except (ValueError, TypeError):
                k = None
        agg.setdefault(r.event_type, []).append(k)
    out = {r.event_type: r for r in _q("events_json_extract")(spark, SF).collect()}
    assert set(out) == set(agg)
    for et, ks in agg.items():
        vals = [k for k in ks if k is not None]
        assert out[et].n == len(ks)
        if vals:
            assert out[et].max_k == max(vals)
            assert abs(out[et].avg_k - round(sum(vals) / len(vals), 4)) < 1e-9
        else:
            assert out[et].max_k is None and out[et].avg_k is None


def test_time_weighted_avg_convexity_and_interval_count(spark):
    """TWA is a convex combination of observed values (must lie in
    [min, max] per type), and each type contributes exactly count-1
    lead intervals."""
    e = load_table(spark, SF, "events")
    stats = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"), F.count("*").alias("n"))
        .collect()
    }
    for r in _q("time_weighted_avg")(spark, SF).collect():
        s = stats[r.event_type]
        assert r.n_intervals == s.n - 1
        if r.twa_value is not None:
            assert s.lo - 1e-9 <= r.twa_value <= s.hi + 1e-9
