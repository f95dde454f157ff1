"""State-store introspection (streaming/state_reader.py): read a debounce
checkpoint's keyed state back as a DataFrame — the Spark-native form of
opening the reference's BadgerDB store offline (watchdog.go:58-74,
fspolling.go:71-87)."""

from __future__ import annotations

import datetime as dt
import time
import uuid

from log_agent_spark.schemas import EVENT_SCHEMA
from log_agent_spark.streaming.debounce import debounce_stream
from log_agent_spark.streaming.state_reader import read_debounce_state


def _event(path, op, sec):
    t = dt.datetime(2024, 1, 1, 0, 0, sec)
    return (path, op, "BSI", "/root", t, t, False)


def test_read_debounce_state_shows_inflight_keys(spark, tmp_path):
    src_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    table = f"debounced_{uuid.uuid4().hex[:8]}"

    spark.createDataFrame(
        [_event("/a", "CREATE", 1), _event("/a", "WRITE", 2)], EVENT_SCHEMA
    ).write.parquet(src_dir)

    # A debounce window far longer than the test: the key stays IN-FLIGHT
    # (state armed, nothing emitted), which is exactly what the state
    # reader should surface.
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
    q = (
        debounce_stream(stream, debounce_ms=600_000)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not any(
            p and p.get("numInputRows", 0) > 0 for p in [q.lastProgress or {}]
        ):
            time.sleep(1)
        # one more committed batch so the state delta is durable
        deadline = time.time() + 90
        while time.time() < deadline and (q.lastProgress or {}).get("batchId", 0) < 2:
            time.sleep(1)
    finally:
        q.stop()

    state = read_debounce_state(spark, ckpt)
    rows = state.collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.path == "/a"
    # state holds the LAST event of the storm (keep-latest, watchdog.go:229-246)
    assert row.op == "WRITE"
    assert row.ts_us == int(dt.datetime(2024, 1, 1, 0, 0, 2).timestamp() * 1_000_000)
