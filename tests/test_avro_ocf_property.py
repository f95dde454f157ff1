"""Property-based round-trip for the Avro OCF codec (no Spark session):
for arbitrary rows over the full supported type surface, write_ocf ∘
iter_ocf must be the identity. Catches varint boundary cases, union
branch indices, empty arrays/strings, and negative timestamps that
example-based tests under-sample."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from log_agent_spark.sources.avro_ocf import iter_ocf, write_ocf

SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "s", "type": ["null", "string"]},
        {"name": "l", "type": ["null", "long"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "raw", "type": ["null", "bytes"]},
        {"name": "ts", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
    ],
}

_LONGS = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_TS = st.datetimes(
    min_value=dt.datetime(1677, 9, 22),  # int64-micros representable range
    max_value=dt.datetime(2262, 4, 11),
)

_ROW = st.tuples(
    st.none() | st.text(max_size=50),
    st.none() | _LONGS,
    st.none() | st.floats(allow_nan=False),  # NaN != NaN breaks equality, not codec
    st.none() | st.booleans(),
    st.none() | st.binary(max_size=40),
    st.none() | _TS,
    st.lists(_LONGS, max_size=8),
)


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(_ROW, max_size=30), codec=st.sampled_from(["null", "deflate"]))
def test_ocf_roundtrip_identity(tmp_path_factory, rows, codec):
    path = str(tmp_path_factory.mktemp("ocf") / "prop.avro")
    # tiny blocks to exercise multi-block paths even on short inputs
    n = write_ocf(path, SCHEMA, rows, codec=codec, block_bytes=64)
    assert n == len(rows)
    assert list(iter_ocf(path)) == [tuple(r) for r in rows]
