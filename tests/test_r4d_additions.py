"""Semantic tests for the fourth batch of round-4 additions (vocabulary
coverage curve, generalization ladder, multi-window SLO burn rate) —
pandas/numpy replays plus the closed-form properties each report must
satisfy."""

from __future__ import annotations

import collections

import pandas as pd

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# vocabulary coverage
# ---------------------------------------------------------------------------
def test_vocab_coverage_matches_pandas(spark):
    from log_agent_spark.operators.text import _VOCAB_SIZES, q_vocab_coverage

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts = collections.Counter()
    for t in docs["text"]:
        counts.update(tok for tok in t.split(" ") if tok != "")
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    got = {r["vocab_size"]: r.asDict() for r in q_vocab_coverage(spark, SF).collect()}
    assert set(got) == set(_VOCAB_SIZES)
    for v in _VOCAB_SIZES:
        covered = sum(f for _, f in ranked[:v])
        row = got[v]
        assert row["n_types"] == min(v, len(ranked))
        assert row["covered_occurrences"] == covered
        assert row["total_occurrences"] == total
        assert row["coverage"] == round(covered / total, 6)
    # coverage is monotone in vocab size
    covs = [got[v]["coverage"] for v in sorted(_VOCAB_SIZES)]
    assert covs == sorted(covs)


# ---------------------------------------------------------------------------
# generalization ladder
# ---------------------------------------------------------------------------
def _ladder_replay():
    """pandas replay of the query's RESIDUAL-group cascade: the k-check at
    each coarser level counts only the rows still needing generalization."""
    import math

    from log_agent_spark.operators.governance import _ACCTBAL_BAND, _K_ANON

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    qi = pd.DataFrame(
        {
            "n": cust["c_nationkey"].astype("int64"),
            "s": cust["c_mktsegment"],
            "b": (cust["c_acctbal"] / _ACCTBAL_BAND).map(math.floor),
        }
    )
    sz0 = qi.groupby(["n", "s", "b"])["n"].transform("size")
    level = pd.Series(-1, index=qi.index)
    level[sz0 >= _K_ANON] = 0
    r1 = level < 0
    sz1r = qi[r1].groupby(["n", "s"])["n"].transform("size")
    level[sz1r[sz1r >= _K_ANON].index] = 1
    r2 = level < 0
    sz2r = qi[r2].groupby(["n"])["n"].transform("size")
    level[sz2r[sz2r >= _K_ANON].index] = 2
    level[level < 0] = 3
    keys = pd.Series("*", index=qi.index)
    asstr = lambda col: qi[col].astype(str)  # noqa: E731
    keys[level == 2] = asstr("n")
    keys[level == 1] = asstr("n") + "|" + asstr("s")
    keys[level == 0] = asstr("n") + "|" + asstr("s") + "|" + asstr("b")
    return qi, level, keys


def test_generalization_ladder_matches_pandas(spark):
    from log_agent_spark.operators.governance import (
        q_privacy_generalization_ladder,
    )

    qi, level, keys = _ladder_replay()
    ref_rows = level.value_counts().to_dict()
    got = {
        r["level"]: r.asDict()
        for r in q_privacy_generalization_ladder(spark, SF).collect()
    }
    assert {k: v["n_rows"] for k, v in got.items()} == ref_rows
    assert sum(v["n_rows"] for v in got.values()) == len(qi)
    for lv, v in got.items():
        assert v["n_groups"] == keys[level == lv].nunique()
        assert v["pct_rows"] == round(v["n_rows"] * 100.0 / len(qi), 6)


def test_generalization_ladder_released_groups_reach_k(spark):
    """The whole point of the residual cascade: every group actually
    RELEASED at level < 3 — i.e. the set of rows sharing a released key —
    has at least k members. (The naive full-group k-check fails this: a
    coarse group whose finer subgroups were already released can leave a
    sub-k residue.)"""
    from log_agent_spark.operators.governance import _K_ANON

    _qi, level, keys = _ladder_replay()
    released = level < 3
    group_sizes = keys[released].groupby(keys[released]).size()
    assert (group_sizes >= _K_ANON).all(), group_sizes[group_sizes < _K_ANON]


# ---------------------------------------------------------------------------
# embedding drift audit
# ---------------------------------------------------------------------------
def test_embedding_drift_audit_matches_numpy(spark):
    import numpy as np

    from log_agent_spark.operators.similarity import (
        _CENTROID_Q,
        _DRIFT_THRESHOLD_SCALED,
        q_embedding_drift_audit,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    cand = (emb["vec_id"].to_numpy() % 2 == 1)

    def _qsum(rows):
        v = rows * _CENTROID_Q
        return (np.sign(v) * np.floor(np.abs(v) + 0.5)).sum(axis=0).astype("int64")

    q_ref, q_cand = _qsum(X[~cand]), _qsum(X[cand])
    n_ref, n_cand = int((~cand).sum()), int(cand.sum())
    got = {r["dim"]: r.asDict() for r in q_embedding_drift_audit(spark, SF).collect()}
    assert set(got) == set(range(X.shape[1]))
    for dim, row in got.items():
        assert row["n_ref"] == n_ref and row["n_cand"] == n_cand
        diff = int(q_cand[dim]) * n_ref - int(q_ref[dim]) * n_cand
        assert row["is_drifted"] == (
            abs(diff) > n_ref * n_cand * _DRIFT_THRESHOLD_SCALED
        )
        assert row["mean_ref"] == round(int(q_ref[dim]) / (n_ref * _CENTROID_Q), 6)
        assert row["mean_shift"] == round(diff / (n_ref * n_cand * _CENTROID_Q), 6) + 0.0


# ---------------------------------------------------------------------------
# incremental connected components
# ---------------------------------------------------------------------------
def test_cc_incremental_matches_union_find(spark):
    """Replay both paths with an independent union-find and assert the
    query's histograms AND its own match flags."""
    from log_agent_spark.operators.graph import (
        _CC_IVM_DELTA_MOD,
        q_graph_cc_incremental,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["doc_id"] < 120][["doc_id", "lang", "text"]]
    docs["prefix"] = docs["text"].str[:40]

    def _lev(a, b):
        # classic DP; strings are 40 chars so this is fine at test scale
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    edges = []
    rows = list(docs.itertuples(index=False))
    for i, x in enumerate(rows):
        for y in rows[i + 1 :]:
            if x.lang == y.lang and _lev(x.prefix, y.prefix) <= 24:
                s, t = sorted((int(x.doc_id), int(y.doc_id)))
                edges.append((s, t))

    def _components(edge_list):
        parent = {int(d): int(d) for d in docs["doc_id"]}

        def find(u):
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        for s, t in edge_list:
            rs, rt = find(s), find(t)
            if rs != rt:
                parent[max(rs, rt)] = min(rs, rt)
        sizes = collections.Counter(find(u) for u in parent)
        return collections.Counter(sizes.values())  # size -> n_components

    delta = [(s, t) for s, t in edges if (s * 131 + t) % _CC_IVM_DELTA_MOD == 0]
    old = [(s, t) for s, t in edges if (s * 131 + t) % _CC_IVM_DELTA_MOD != 0]
    assert delta and old, "split must exercise both paths"
    hist_all = _components(edges)
    # TRUE contract-then-merge replay of the incremental path: run CC on
    # old edges only, materialize its (node -> comp) labels, then build a
    # FRESH union-find seeded with ONLY those label edges plus the delta —
    # the old edges themselves are never consulted again, exactly like the
    # query's stored-labels contraction
    def _labels(edge_list):
        parent = {int(d): int(d) for d in docs["doc_id"]}

        def find(u):
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        for s, t in edge_list:
            rs, rt = find(s), find(t)
            if rs != rt:
                parent[max(rs, rt)] = min(rs, rt)
        return {u: find(u) for u in parent}

    labels_old = _labels(old)
    label_edges = [tuple(sorted((u, c))) for u, c in labels_old.items() if u != c]
    labels_inc = _labels(label_edges + delta)
    labels_all = _labels(edges)
    assert labels_inc == labels_all  # assignment-exact, not just sizes
    hist_inc = collections.Counter(
        collections.Counter(labels_inc.values()).values()
    )
    assert hist_inc == hist_all

    got = {r["comp_size"]: r.asDict() for r in q_graph_cc_incremental(spark, SF).collect()}
    assert {k: v["n_components_oneshot"] for k, v in got.items()} == dict(hist_all)
    for v in got.values():
        assert v["match"] is True
        assert v["n_label_mismatches"] == 0
        assert v["n_components_incremental"] == v["n_components_oneshot"]


# ---------------------------------------------------------------------------
# SLO burn rate
# ---------------------------------------------------------------------------
def test_slo_burn_rate_matches_pandas(spark):
    from log_agent_spark.plans.events import q_slo_burn_rate

    ev = pd.read_parquet(f"{SF}/events.parquet")
    # fixture ts is int64 nanos or datetime — normalize to epoch seconds
    ts = ev["ts"]
    if ts.dtype == "int64":  # raw nanos
        secs = ts // 1_000_000_000
    else:  # datetime64 of whatever unit — cast to whole seconds directly
        secs = ts.astype("datetime64[s]").astype("int64")
    hour = secs // 3600
    df = pd.DataFrame({"hour": hour, "err": (ev["event_type"] == "error")})
    hourly = (
        df.groupby("hour")
        .agg(errors=("err", "sum"), total=("err", "size"))
        .sort_index()
    )
    err_all, tot_all = int(hourly["errors"].sum()), int(hourly["total"].sum())
    got = {r["hour_idx"]: r.asDict() for r in q_slo_burn_rate(spark, SF).collect()}
    assert set(got) == set(hourly.index)
    for h, row in hourly.iterrows():
        e6 = int(hourly.loc[(hourly.index >= h - 5) & (hourly.index <= h), "errors"].sum())
        t6 = int(hourly.loc[(hourly.index >= h - 5) & (hourly.index <= h), "total"].sum())
        g = got[h]
        assert g["errors_1h"] == row["errors"] and g["total_1h"] == row["total"]
        assert g["errors_6h"] == e6 and g["total_6h"] == t6
        e1, t1 = int(row["errors"]), int(row["total"])
        assert g["page"] == (
            e1 * tot_all * 100 > t1 * err_all * 125
            and e6 * tot_all * 100 > t6 * err_all * 125
        )
        assert g["ticket"] == (e6 * tot_all * 100 > t6 * err_all * 110)
        assert g["burn_1h"] == round((e1 * tot_all) / (t1 * err_all), 4)
    # two-window hysteresis: a page always implies at least a ticket
    for g in got.values():
        if g["page"]:
            assert g["ticket"]
