"""Debounce (T1) streaming semantics: an event storm per key collapses to
ONE emitted record — the LAST event — after a quiet window.

Driving pattern per .claude/skills/verify/SKILL.md: file source → debounce →
memory sink with an explicit processing-time trigger, polled with a
deadline (processAllAvailable() can block on pending processing-time
timers)."""

from __future__ import annotations

import datetime as dt
import time
import uuid

import pytest

from log_agent_spark.schemas import EVENT_SCHEMA
from log_agent_spark.streaming.debounce import debounce_stream


def _event(path, op, sec):
    return (
        path,
        op,
        "BSI",
        "/root",
        dt.datetime(2024, 1, 1, 0, 0, sec),
        dt.datetime(2024, 1, 1, 0, 0, sec),
        False,
    )


def test_debounce_collapses_storm_to_last_event(spark, tmp_path):
    src_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    table = f"debounced_{uuid.uuid4().hex[:8]}"

    # one storm on /a (4 events), one lone event on /b — expect exactly 2
    # emitted rows: last-of-storm for /a, the single event for /b.
    storm = [_event("/a", "CREATE", 1), _event("/a", "WRITE", 2),
             _event("/a", "WRITE", 3), _event("/a", "WRITE", 4),
             _event("/b", "CREATE", 1)]
    spark.createDataFrame(storm, EVENT_SCHEMA).write.parquet(src_dir)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
    q = (
        debounce_stream(stream, debounce_ms=1000)
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
        # the storm collapsed to its LAST event (watchdog.go:193-251)
        assert by_path["/a"].op == "WRITE"
        assert by_path["/a"].ts == dt.datetime(2024, 1, 1, 0, 0, 4)
        assert by_path["/b"].op == "CREATE"
        # exactly one record per key — no intermediate emissions
        assert len(rows) == 2
    finally:
        q.stop()
