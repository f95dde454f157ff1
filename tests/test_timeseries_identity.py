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
        assert r.residual > 0
        # 4dp-rounded residual can sit ON the printed boundary; the gate is
        # exact, so only assert agreement away from the rounded edge
        if abs(r.residual - 1.2) > 1e-3 and abs(r.residual - 0.8) > 1e-3:
            assert r.is_anomaly == (r.residual > 1.2 or r.residual < 0.8), r
