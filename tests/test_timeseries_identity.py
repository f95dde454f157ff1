"""The load-bearing math of events_cusum_shift: the windowed rewrite

    S_t = P_t - min(0, min_{i<=t} P_i),  P_t = prefix sum of y

must equal Page's recursive filter S_t = max(0, S_{t-1} + y_t) for every
integer series — this is what lets the detector run as two plain window
functions instead of a fold."""

from __future__ import annotations

from hypothesis import given, strategies as st


def _fold(ys):
    s, out = 0, []
    for y in ys:
        s = max(0, s + y)
        out.append(s)
    return out


def _windowed(ys):
    out, p, mn = [], 0, 0  # mn = min(0, running min of P)
    for y in ys:
        p += y
        mn = min(mn, p)
        out.append(p - mn)
    return out


@given(st.lists(st.integers(min_value=-10_000, max_value=10_000), max_size=200))
def test_cusum_windowed_identity(ys):
    assert _windowed(ys) == _fold(ys)


def _dense(pts):
    """[(day, cnt)] -> gap-filled float counts over [min(day), max(day)] —
    the same real-zero densification _daily_dense applies in-engine."""
    import datetime as dt

    m = {d: c for d, c in pts}
    d0, d1 = min(m), max(m)
    return [
        float(m.get(d0 + dt.timedelta(i), 0))
        for i in range((d1 - d0).days + 1)
    ]


def test_seasonal_anomaly_gate_matches_residual(spark):
    """The integer cross-multiplication gate must agree with the float
    residual everywhere, every (type, day) appears exactly once, and
    residuals are positive."""
    from log_agent_spark.operators.timeseries import q_seasonal_anomaly

    rows = q_seasonal_anomaly(spark, "/root/testdata/sf0.001").collect()
    seen = set()
    for r in rows:
        key = (r.event_type, r.day)
        assert key not in seen
        seen.add(key)
        assert r.residual >= 0
        # 4dp-rounded residual can sit ON the printed boundary; the gate is
        # exact, so only assert agreement away from the rounded edge
        if abs(r.residual - 1.2) > 1e-3 and abs(r.residual - 0.8) > 1e-3:
            assert r.is_anomaly == (r.residual > 1.2 or r.residual < 0.8), r


def test_holt_fold_matches_python_replay(spark):
    """The aggregate() fold must equal a literal Python replay of the Holt
    recurrence (same operation order, dyadic alpha=beta=0.5 -> exact
    doubles), and on a perfectly linear series level == last value and
    trend == slope."""
    from collections import defaultdict

    from log_agent_spark.operators.timeseries import q_forecast_holt
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    from log_agent_spark.sources.tables import load_table

    daily = (
        load_table(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("double").alias("cnt"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.cnt))
    out = {r.event_type: r for r in q_forecast_holt(spark, sf).collect()}
    for etype, pts in series.items():
        xs = _dense(pts)
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[1:]:
            nl = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.5 * b
            l = nl
        r = out[etype]
        assert r.level == round(l, 6) and r.trend == round(b, 6), (etype, l, b, r)
        assert r.fc_7d == round(l + 7 * b, 6)

    # linear series: Holt locks on exactly
    xs = [10.0 + 3.0 * i for i in range(12)]
    l, b = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        nl = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.5 * b
        l = nl
    assert l == xs[-1] and b == 3.0


def test_mann_kendall_python_replay(spark):
    """S, Var(S) with tie correction, z, and the Theil-Sen median must all
    match a literal Python replay over the same daily counts."""
    import math
    from collections import defaultdict

    from log_agent_spark.operators.timeseries import q_trend_robust
    from log_agent_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    daily = (
        load_table(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.cnt))
    out = {r.event_type: r for r in q_trend_robust(spark, sf).collect()}
    for etype, pts in series.items():
        xs = _dense(pts)
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        slopes = sorted(
            (xs[j] - xs[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
        )
        m = len(slopes)
        sen = (
            slopes[m // 2]
            if m % 2 == 1
            else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
        )
        tie = defaultdict(int)
        for x in xs:
            tie[x] += 1
        var_s = (
            n * (n - 1) * (2 * n + 5)
            - sum(t * (t - 1) * (2 * t + 5) for t in tie.values())
        ) / 18.0
        z = (s - 1) / math.sqrt(var_s) if s > 0 else (
            (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
        )
        r = out[etype]
        assert r.s_stat == s and r.n == n and r.n_pairs == m
        assert r.var_s == round(var_s, 4)
        assert r.z == round(z, 4)
        assert r.sen_slope == round(sen, 6), (etype, sen, r.sen_slope)


def test_holt_winters_python_replay(spark):
    """The triple-exponential fold (level/trend/seasonal-ring struct
    accumulator) must equal a literal Python replay of the recurrence."""
    from collections import defaultdict

    from log_agent_spark.operators.timeseries import (
        _HW_M,
        q_forecast_holt_winters,
    )
    from log_agent_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    daily = (
        load_table(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("double").alias("cnt"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.cnt))
    got = defaultdict(dict)
    for r in q_forecast_holt_winters(spark, sf).collect():
        got[r.event_type][r.h] = r.fc
    for etype, pts in series.items():
        xs = _dense(pts)
        if len(xs) < 2 * _HW_M:
            assert etype not in got
            continue
        wk1 = (((((xs[0] + xs[1]) + xs[2]) + xs[3]) + xs[4]) + xs[5] + xs[6]) / 7.0
        wk2 = (((((xs[7] + xs[8]) + xs[9]) + xs[10]) + xs[11]) + xs[12] + xs[13]) / 7.0
        l, b = wk1, (wk2 - wk1) / 7.0
        seas = [x - wk1 for x in xs[:7]]
        for x in xs[7:]:
            nl = 0.5 * (x - seas[0]) + 0.5 * (l + b)
            nb = 0.5 * ((0.5 * (x - seas[0]) + 0.5 * (l + b)) - l) + 0.5 * b
            ns = 0.5 * (x - (0.5 * (x - seas[0]) + 0.5 * (l + b))) + 0.5 * seas[0]
            seas = seas[1:] + [ns]
            l, b = nl, nb
        for h in range(1, _HW_M + 1):
            want = round(l + h * b + seas[(h - 1) % _HW_M], 6)
            assert got[etype][h] == want, (etype, h, want, got[etype][h])


def test_daily_dense_fills_gaps_with_real_zeros(spark):
    """Synthetic gapped input: the spine must cover every day in the
    per-type [min, max] range with zero counts for missing days — the
    property that keeps ring/slope indexing on the calendar."""
    import datetime as dt

    from log_agent_spark.operators.timeseries import _daily_dense

    def ts(day, n):
        base = dt.datetime(2024, 3, 1) + dt.timedelta(days=day)
        return [(base + dt.timedelta(minutes=i),) for i in range(n)]

    rows = [("a", t[0]) for d, n in [(0, 2), (1, 3), (4, 1)] for t in ts(d, n)]
    rows += [("b", t[0]) for d, n in [(2, 5), (3, 1)] for t in ts(d, n)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        (r.event_type, r.day): r.cnt for r in _daily_dense(ev).collect()
    }
    d0 = dt.date(2024, 3, 1)
    # type a spans 5 days with days 2 and 3 missing -> zeros
    want_a = {0: 2, 1: 3, 2: 0, 3: 0, 4: 1}
    for off, cnt in want_a.items():
        assert out[("a", d0 + dt.timedelta(days=off))] == cnt
    # type b spans only its own [min, max], independent of type a's
    assert ("b", d0 + dt.timedelta(days=1)) not in out
    assert out[("b", d0 + dt.timedelta(days=2))] == 5
    assert out[("b", d0 + dt.timedelta(days=3))] == 1
    assert len(out) == 7


def test_backtest_consistent_with_holt_on_trimmed_series(spark):
    """The backtest's Holt prediction must equal replaying the recurrence
    over the series minus its held-out last value, and the winner flag
    must agree with the reported absolute errors."""
    from collections import defaultdict

    from log_agent_spark.operators.timeseries import q_forecast_backtest
    from log_agent_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    daily = (
        load_table(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.cnt))
    out = {r.event_type: r for r in q_forecast_backtest(spark, sf).collect()}
    for etype, pts in series.items():
        xs = _dense(pts)
        if len(xs) < 9:
            assert etype not in out
            continue
        train = xs[:-1]
        l, b = train[0], train[1] - train[0]
        for x in train[1:]:
            nl = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.5 * b
            l = nl
        r = out[etype]
        assert r.actual == xs[-1] and r.naive_pred == xs[-8]
        assert r.holt_pred == round(l + b, 6)
        assert r.holt_wins == (abs(xs[-1] - (l + b)) < abs(xs[-1] - xs[-8]))
