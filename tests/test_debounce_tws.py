"""transformWithStateInPandas debounce (streaming/debounce_tws.py): same
storm-collapse semantics as the applyInPandasWithState form, on the Spark 4
stateful API with explicit reset-on-event timers and RocksDB state."""

from __future__ import annotations

import datetime as dt
import time
import uuid

import pytest

from log_agent_spark.schemas import EVENT_SCHEMA
from log_agent_spark.streaming.debounce_tws import HAS_TWS_DEPS, debounce_stream_tws

pytestmark = pytest.mark.skipif(
    not HAS_TWS_DEPS,
    reason="transformWithState Python runner requires google.protobuf "
    "(not in this container); debounce.py covers the semantics",
)


def _event(path, op, sec):
    t = dt.datetime(2024, 1, 1, 0, 0, sec)
    return (path, op, "BSI", "/root", t, t, False)


def test_tws_debounce_collapses_storm(spark, tmp_path, rocksdb_state_store):
    src_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    table = f"tws_debounced_{uuid.uuid4().hex[:8]}"

    storm = [
        _event("/a", "CREATE", 1),
        _event("/a", "WRITE", 2),
        _event("/a", "WRITE", 3),
        _event("/b", "CREATE", 1),
    ]
    spark.createDataFrame(storm, EVENT_SCHEMA).write.parquet(src_dir)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
    q = (
        debounce_stream_tws(stream, debounce_ms=1000)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.sql(f"SELECT * FROM {table}").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
        by_path = {r.path: r for r in rows}
        assert set(by_path) == {"/a", "/b"}, f"got {rows}"
        assert by_path["/a"].op == "WRITE"
        assert by_path["/a"].ts == dt.datetime(2024, 1, 1, 0, 0, 3)
        assert len(rows) == 2  # one record per key, no intermediate emits
    finally:
        q.stop()
