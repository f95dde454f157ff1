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


def test_tumbling_window_partitions_events(spark):
    """Tumbling hour windows partition the stream: per-cell counts sum to
    the table count, every window boundary is hour-aligned, and distinct
    users never exceed events in a cell."""
    rows = _q("events_tumbling_window")(spark, SF).collect()
    assert sum(r.n_events for r in rows) == load_table(spark, SF, "events").count()
    for r in rows:
        assert r.hour_ms % 3_600_000 == 0
        assert 0 < r.n_users <= r.n_events


def test_pivot_cells_partition_events(spark):
    from log_agent_spark.plans.events import EVENT_TYPES

    e = load_table(spark, SF, "events")
    rows = _q("events_pivot")(spark, SF).collect()
    assert len(rows) == e.select("user_id").distinct().count()
    assert (
        sum(sum(getattr(r, t) for t in EVENT_TYPES) for r in rows) == e.count()
    )


def test_transition_matrix_rows_are_distributions(spark):
    """Σ transitions == Σ_user (events - 1), and each from-state's
    probabilities are its counts normalized (python-replayed, 4dp)."""
    e = load_table(spark, SF, "events")
    expected_pairs = e.count() - e.select("user_id").distinct().count()
    rows = _q("events_transition_matrix")(spark, SF).collect()
    assert sum(r.n for r in rows) == expected_pairs
    by_from: dict[str, int] = {}
    for r in rows:
        by_from[r.from_state] = by_from.get(r.from_state, 0) + r.n
    for r in rows:
        assert abs(r.p - round(r.n / by_from[r.from_state], 4)) < 1e-9


def test_pareto_python_replay(spark):
    """Full replay: per-customer revenue sorted desc in python, sequential
    cumsum, first 80% crossing — rank and share must match the engine's
    distributed range-partitioned cumsum."""
    from log_agent_spark.plans.analytics import PARETO_TARGET

    per_cust = (
        load_table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .collect()
    )
    ranked = sorted(per_cust, key=lambda r: (-r.rev, r.o_custkey))
    total = sum(r.rev for r in ranked)
    cum, n_top = 0.0, None
    for i, r in enumerate(ranked, start=1):
        cum += r.rev
        if cum >= PARETO_TARGET * total:
            n_top, share = i, cum / total
            break
    row = _q("pareto_revenue_concentration")(spark, SF).collect()[0]
    assert row.n_customers == len(ranked)
    assert row.n_top == n_top
    assert abs(row.top_fraction - round(n_top / len(ranked), 4)) < 1e-9
    # the distributed cumsum adds doubles in a different association than
    # the sequential replay; the 4dp-rounded share may differ by one ulp
    # of the rounding grid
    assert abs(row.revenue_share - round(share, 4)) <= 1e-4


def test_hhi_bounds(spark):
    """HHI of a part lies in [1/n_suppliers, 1]; single-supplier parts are
    exactly 1."""
    for r in _q("part_supplier_hhi")(spark, SF).collect():
        assert r.n_parts > 0
        assert r.min_hhi >= round(1.0 / r.n_suppliers, 4) - 1e-9
        assert r.max_hhi <= 1.0 + 1e-9
        if r.n_suppliers == 1:
            assert r.min_hhi == r.max_hhi == 1.0


def test_source_mixture_accounts_every_document(spark):
    d = load_table(spark, SF, "documents")
    rows = _q("sample_source_mixture")(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == d.count()
    assert len(rows) == d.select("source").distinct().count()
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        if r.rate_pct is not None:
            assert 10 <= r.rate_pct <= 86


def test_token_frequency_python_replay(spark):
    """Top-20 token frequencies replayed with collections.Counter over a
    plain python split — no Spark expression on the replay side."""
    import collections

    texts = [
        r.text for r in load_table(spark, SF, "documents").select("text").collect()
    ]
    ctr = collections.Counter(t for s in texts if s for t in s.split(" ") if t != "")
    expected = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.token, r.freq) for r in _q("text_token_frequency")(spark, SF).collect()]
    assert got == expected


def test_keep_latest_python_replay(spark):
    """Per (user, type) the survivor is exactly the max-(ms, event_id) row —
    replayed with a python max over the collected raw events (ts truncated
    to ms, matching unix_millis ordering)."""
    raw = (
        load_table(spark, SF, "events")
        .select("user_id", "event_type", "event_id", "ts")
        .collect()
    )
    best: dict[tuple, tuple] = {}
    for r in raw:
        ms = r.ts.replace(microsecond=(r.ts.microsecond // 1000) * 1000)
        k = (r.user_id, r.event_type)
        if k not in best or (ms, r.event_id) > best[k][:2]:
            best[k] = (ms, r.event_id)
    got = {
        (r.user_id, r.event_type): r.event_id
        for r in _q("dedup_keep_latest")(spark, SF).collect()
    }
    assert got == {k: v[1] for k, v in best.items()}


def test_sessionize_partitions_each_users_events(spark):
    per_user = {
        r.user_id: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = _q("events_sessionize")(spark, SF).collect()
    assert {r.user_id for r in rows} == set(per_user)
    for r in rows:
        assert r.n_events == per_user[r.user_id]  # sessions partition events
        assert 1 <= r.n_sessions <= r.n_events
        assert r.max_session_ms >= 0


def test_rolling_7d_users_dominates_daily(spark):
    e = load_table(spark, SF, "events")
    daily = {
        r.day: r.n
        for r in e.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    n_total = e.select("user_id").distinct().count()
    rows = _q("events_rolling_7d_users")(spark, SF).collect()
    assert len(rows) == len(daily)
    for r in rows:
        day = dt.datetime.fromtimestamp(
            r.window_day_ms / 1000.0, tz=dt.timezone.utc
        ).date()
        # the 7d window ending on `day` contains that day's users
        assert daily[day] <= r.active_users_7d <= n_total


def test_scd2_versions_chain_without_gaps(spark):
    """SCD2 contract per user: dense versions 1..k, exactly one current
    row, and each version's valid_to equals the next version's
    valid_from (half-open chaining)."""
    rows = _q("events_scd2_dimension")(spark, SF).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1)), user
        assert sum(1 for v in vs if v.is_current) == 1
        assert vs[-1].is_current and vs[-1].valid_to_ms is None
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_ms == b.valid_from_ms, user
            assert a.state != b.state, user  # a version exists only on change


def test_interval_overlap_counts_are_bounded(spark):
    e = load_table(spark, SF, "events")
    n_users = e.select("user_id").distinct().count()
    types = {r.event_type for r in e.select("event_type").distinct().collect()}
    rows = _q("events_interval_overlap")(spark, SF).collect()
    # every type overlaps at least its own emitters' same-day spans
    assert {r.event_type for r in rows} == types
    for r in rows:
        assert 0 < r.n_users <= min(n_users, r.n_pairs)


def test_range_frame_python_replay(spark):
    """Trailing-5-minute RANGE frame replayed per user in python: for each
    row, sum/count over rows with ts in (t-300s, t] by VALUE (peers with
    equal ts included regardless of row order)."""
    raw = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "value", F.unix_micros("ts").alias("ts_us"))
        .collect()
    )
    by_user: dict = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for rows_u in by_user.values():
        for r in rows_u:
            win = [
                x for x in rows_u if r.ts_us - 300_000_000 <= x.ts_us <= r.ts_us
            ]
            expect[r.event_id] = (round(sum(x.value for x in win), 2), len(win))
    got = {
        r.event_id: (r.trailing_5m_value, r.trailing_5m_events)
        for r in _q("window_range_frame")(spark, SF).collect()
    }
    assert len(got) == len(expect)
    for eid, (v, n) in expect.items():
        gv, gn = got[eid]
        assert gn == n, eid
        assert abs(gv - v) <= 0.02, eid  # double-sum association at 2dp


def test_vocab_coverage_is_monotone(spark):
    rows = sorted(
        _q("text_vocab_coverage")(spark, SF).collect(), key=lambda r: r.vocab_size
    )
    assert rows
    prev_types = prev_cov = 0
    for r in rows:
        assert 0 <= r.covered_occurrences <= r.total_occurrences
        assert r.n_types >= prev_types and r.covered_occurrences >= prev_cov
        assert r.n_types <= r.vocab_size
        prev_types, prev_cov = r.n_types, r.covered_occurrences


def test_decontam_sweep_is_monotone_in_n(spark):
    """A doc containing a matched (n+1)-gram necessarily contains a matched
    n-gram, so contamination counts are non-increasing in n."""
    rows = sorted(
        _q("decontam_ngram_sweep")(spark, SF).collect(), key=lambda r: r.ngram_n
    )
    assert len(rows) >= 2
    for a, b in zip(rows, rows[1:]):
        assert b.n_contaminated <= a.n_contaminated
        assert 0.0 <= b.contaminated_frac <= a.contaminated_frac <= 1.0


def test_sliding_window_double_counts_exactly(spark):
    """A 2h/1h sliding window assigns every event to exactly two windows,
    so per-cell counts sum to 2x the table; window starts are hour-aligned
    and one hour apart within a type's coverage."""
    rows = _q("events_sliding_window")(spark, SF).collect()
    assert sum(r.n_events for r in rows) == 2 * load_table(spark, SF, "events").count()
    for r in rows:
        assert r.w_start_ms % 3_600_000 == 0


def test_pit_join_matches_every_event_exactly_once(spark):
    """The SCD2 validity windows partition each user's timeline from the
    first event on, so the point-in-time join matches every event to
    exactly one version: per-user joined counts equal raw counts."""
    per_user = {
        r.user_id: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = _q("events_pit_versioned_join")(spark, SF).collect()
    assert {r.user_id for r in rows} == set(per_user)
    for r in rows:
        assert r.n_events == per_user[r.user_id]
        assert 1 <= r.n_states_seen <= r.n_versions


def test_cdc_apply_python_replay(spark):
    """Keyed I/U/D merge replayed with dict arithmetic over the snapshot:
    ids < 100 doubled, 100 <= id < 200 deleted, ids < 50 re-inserted at
    +10M, everything else untouched."""
    base = {
        r.event_id: (r.user_id, r.value)
        for r in load_table(spark, SF, "events")
        .select("event_id", "user_id", "value")
        .collect()
    }
    expect = {}
    for eid, (uid, v) in base.items():
        if eid < 100:
            expect[eid] = (uid, v * 2)
        elif eid < 200:
            pass  # deleted
        else:
            expect[eid] = (uid, v)
    for eid, (uid, v) in base.items():
        if eid < 50:
            expect[eid + 10_000_000] = (uid, v)
    got = {
        r.event_id: (r.user_id, r.value)
        for r in _q("events_cdc_apply")(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for eid, (uid, v) in expect.items():
        guid, gv = got[eid]
        assert guid == uid and abs(gv - v) < 1e-9, eid


def test_doc_fingerprint_is_content_determined(spark):
    """Equal text => equal fingerprint (bottom-k sketch is a pure content
    function); non-empty texts get non-null fingerprints."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    text_of = {r.doc_id: r.text for r in docs}
    fp = {r.doc_id: r.fingerprint for r in _q("text_doc_fingerprint")(spark, SF).collect()}
    assert set(fp) == set(text_of)
    by_text: dict = {}
    for did, t in text_of.items():
        by_text.setdefault(t, set()).add(fp[did])
    for t, fps in by_text.items():
        assert len(fps) == 1, "same text must fingerprint identically"
        if t:
            assert next(iter(fps)) is not None


def test_quality_score_token_count_python_replay(spark):
    docs = {r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()}
    rows = _q("text_quality_score")(spark, SF).collect()
    assert {r.doc_id for r in rows} == set(docs)
    for r in rows:
        t = docs[r.doc_id]
        n = len([x for x in t.split(" ") if x != ""]) if t else 0
        assert r.n_tokens == n, r.doc_id


def test_stratified_cap_respects_the_cap(spark):
    d = load_table(spark, SF, "documents")
    per_lang = {
        r.lang: r.n
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    rows = _q("sample_stratified_cap")(spark, SF).collect()
    assert {r.lang for r in rows} == set(per_lang)
    for r in rows:
        assert r.n_sampled == min(50, per_lang[r.lang])


def test_error_bursts_exceed_triple_the_mean(spark):
    """Every reported window genuinely exceeds 3x the mean errors per
    15-minute window (recomputed from the raw error stream)."""
    e = load_table(spark, SF, "events").filter(F.col("event_type") == "error")
    per_w = (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    mean = sum(r.n for r in per_w) / len(per_w)
    rows = _q("events_error_bursts")(spark, SF).collect()
    for r in rows:
        assert r.n_errors > 3 * mean
        assert abs(r.mean_errors - round(mean, 4)) < 1e-9
    # completeness: every window above the gate is reported
    assert len(rows) == sum(1 for r in per_w if r.n > 3 * mean)


def test_ivf_health_cells_partition_the_corpus(spark):
    from log_agent_spark.operators.similarity import N_CENTROIDS

    n_emb = load_table(spark, SF, "embeddings").count()
    rows = _q("ann_ivf_health")(spark, SF).collect()
    assert len(rows) == N_CENTROIDS  # the spine reports every cell
    assert sum(r.n_vectors for r in rows) == n_emb
    for r in rows:
        assert r.is_empty == (r.n_vectors == 0)
        assert abs(r.imbalance - round(r.n_vectors * N_CENTROIDS / n_emb, 4)) < 1e-9
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3  # 4dp rounding drift


def test_ngram_novelty_conserves_first_sightings(spark):
    """Every distinct corpus n-gram is novel in exactly one doc (its
    min-doc_id first sighting), so Σ n_novel == |distinct n-grams|, and
    the lowest doc_id with any n-grams is fully novel."""
    rows = _q("text_ngram_novelty")(spark, SF).collect()
    from log_agent_spark.operators.decontaminate import token_ngrams

    n_distinct = (
        load_table(spark, SF, "documents")
        .select(F.explode(token_ngrams(F.col("text"))).alias("g"))
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == n_distinct
    for r in rows:
        assert 0 <= r.n_novel <= r.n_distinct_ngrams
    first = min(rows, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_distinct_ngrams  # nothing precedes it


def test_debounce_keep_last_emits_one_event_per_session(spark):
    """The batch debounce twin keeps exactly one event per (user, session):
    row count equals Σ n_sessions from the sessionizer, and every kept
    event is the latest of its session (ts_ms is the session max)."""
    sess_rows = _q("events_sessionize")(spark, SF).collect()
    kept = _q("debounce_keep_last")(spark, SF).collect()
    assert len(kept) == sum(r.n_sessions for r in sess_rows)
    latest = {}
    for r in kept:
        k = (r.user_id, r.session_seq)
        assert k not in latest, "one event per session"
        latest[k] = r.ts_ms
    per_user_sessions: dict = {}
    for (u, _s) in latest:
        per_user_sessions[u] = per_user_sessions.get(u, 0) + 1
    assert per_user_sessions == {r.user_id: r.n_sessions for r in sess_rows}


def test_langid_prediction_is_the_argmax(spark):
    from log_agent_spark.operators.text import LANG_PROFILES

    langs = list(LANG_PROFILES)
    for r in _q("text_langid_heuristic")(spark, SF).collect():
        hits = {l: getattr(r, f"hits_{l}") for l in langs}
        best = max(hits.values())
        if best == 0:
            assert r.predicted_lang == "und"
        else:
            assert r.predicted_lang in langs
            assert hits[r.predicted_lang] == best
            # deterministic tie-break: the FIRST profile with max hits wins
            assert r.predicted_lang == next(l for l in langs if hits[l] == best)


def test_lang_profile_partitions_documents(spark):
    d = load_table(spark, SF, "documents")
    rows = _q("text_lang_profile")(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == d.count()
    assert len(rows) == d.select("lang").distinct().count()
    for r in rows:
        assert r.n_sources > 0 and r.total_tokens > 0


def test_token_bpe_python_replay(spark):
    """Whitespace token counts replayed with str.split; the ratio column
    re-derived from the two counts."""
    docs = {r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()}
    rows = _q("text_token_bpe")(spark, SF).collect()
    assert {r.doc_id for r in rows} == set(docs)
    for r in rows:
        t = docs[r.doc_id]
        assert r.n_ws_tokens == (len([x for x in t.split(" ") if x]) if t else 0)
        if r.n_ws_tokens:
            assert abs(r.bpe_per_word - round(r.n_bpe_tokens / r.n_ws_tokens, 4)) < 1e-9
        else:
            assert r.bpe_per_word is None


def test_tfidf_topterms_are_in_their_documents(spark):
    """Membership + ranking contract: every reported term occurs in its
    doc (python substring-token replay), ranks are dense from 1, and
    tfidf is non-increasing within a doc."""
    docs = {r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()}
    by_doc: dict = {}
    for r in _q("text_tfidf_topterms")(spark, SF).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for did, rs in by_doc.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        toks = set((docs[did] or "").split(" "))
        for a, b in zip(rs, rs[1:]):
            assert a.tfidf >= b.tfidf
        for r in rs:
            assert r.term in toks, (did, r.term)


import pytest  # noqa: E402


@pytest.mark.parametrize(
    "name",
    [
        # self-checking roundtrips / report queries whose oracle already
        # carries the semantic load: pin non-emptiness + rerun stability
        "sql_interface",
        "kafka_wire_roundtrip",
        "ingest_avro_roundtrip",
        "logs_template_mining",
        "sample_importance_weighted",
        "sample_temperature_mixture",
    ],
)
def test_remaining_singles_nonempty_and_rerun_stable(spark, name):
    a = sorted(map(tuple, _q(name)(spark, SF).collect()))
    b = sorted(map(tuple, _q(name)(spark, SF).collect()))
    assert a, name
    assert a == b, name
