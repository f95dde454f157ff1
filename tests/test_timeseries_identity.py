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
