"""Property test: asof_join agrees with pandas merge_asof (backward,
allow_exact_matches) on randomized keyed event sets."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from log_agent_spark.operators.temporal import asof_join

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from log_agent_spark.session import get_spark

        _spark = get_spark("asof_prop")
    return _spark


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


# (key, ts) unique per side — equal-ts duplicates on one side make the
# match ambiguous in ANY asof definition, so they're excluded by design.
side = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 30)),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=side, right=side)
def test_asof_matches_pandas_merge_asof(left, right):
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left)], ["event_id", "key", "ts"]
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, _ts(s)) for i, (k, s) in enumerate(right)],
        ["event_id", "key", "ts"],
    )
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join(ldf, rdf, keys=["key"], payload_cols=["event_id"]).collect()
    }

    lp = pd.DataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left)],
        columns=["event_id", "key", "ts"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(100 + i, k, _ts(s)) for i, (k, s) in enumerate(right)],
        columns=["r_event_id", "key", "ts"],
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="key", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.event_id): (None if pd.isna(r.r_event_id) else int(r.r_event_id))
        for r in merged.itertuples()
    }
    assert got == want
