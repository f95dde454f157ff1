"""Streaming Welford z-score (streaming/anomaly.py): values are scored
against per-key state as of their arrival, across micro-batch boundaries.

Driving pattern per .claude/skills/verify/SKILL.md: file source → stateful
op → memory sink with an explicit trigger, polled with a deadline. The
second batch is written only after the first is fully processed, so the
spike is provably judged by state carried over from batch one."""

from __future__ import annotations

import datetime as dt
import time
import uuid

from log_agent_spark.streaming.anomaly import zscore_stream

SCHEMA = "event_type string, ts timestamp, value double"


def _rows(values, start_sec=0):
    base = dt.datetime(2024, 1, 1)
    return [
        ("m", base + dt.timedelta(seconds=start_sec + i), float(v))
        for i, v in enumerate(values)
    ]


def _poll(spark, table, want, deadline_s=120):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(1)
    return rows


def test_zscore_flags_spike_using_cross_batch_state(spark, tmp_path):
    src_dir = str(tmp_path / "vals")
    ckpt = str(tmp_path / "ckpt")
    table = f"scored_{uuid.uuid4().hex[:8]}"

    # batch 1: ten calm values around 10 (sd ~ 1) — none flaggable
    calm = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 11.2, 8.8, 10.0]
    spark.createDataFrame(_rows(calm), SCHEMA).coalesce(1).write.parquet(src_dir)

    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        zscore_stream(stream, threshold=3.0, min_n=5)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .outputMode("append")
        .start()
    )
    try:
        rows = _poll(spark, table, want=len(calm))
        assert len(rows) == len(calm)
        assert not any(r.is_anomaly for r in rows), rows

        # batch 2: a 100.0 spike plus one more calm value, AFTER batch 1's
        # state exists — the spike must be flagged by carried-over state,
        # and the trailing calm value must not be (the spike inflated the
        # running sd, but 10.3 is still well inside it)
        spike = [100.0, 10.3]
        spark.createDataFrame(_rows(spike, start_sec=60), SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src_dir)
        rows = _poll(spark, table, want=len(calm) + len(spike))
        assert len(rows) == len(calm) + len(spike)
        by_val = {r.value: r for r in rows}
        assert by_val[100.0].is_anomaly and by_val[100.0].z > 3.0
        assert not by_val[10.3].is_anomaly
        # early rows (n < min_n) are never flagged and carry z == 0
        first = sorted(rows, key=lambda r: r.ts)[:5]
        assert all(r.z == 0.0 for r in first)
    finally:
        q.stop()


def test_zscore_scores_late_rows_as_of_arrival(spark, tmp_path):
    """Planted cross-batch inversion (the ooo_tws pattern, VERDICT r6
    stretch): batch 2 carries rows whose EVENT time predates batch 1's —
    the documented semantics score a row against the state as of its
    ARRIVAL, so the late spike must be judged by the full batch-1 state
    (and flagged), not by the empty state that existed at its event time.
    Within the late batch itself, folding is deterministic in (ts, value)
    order, so the late calm row (earlier ts) folds before the spike."""
    src_dir = str(tmp_path / "late_vals")
    ckpt = str(tmp_path / "late_ckpt")
    table = f"late_{uuid.uuid4().hex[:8]}"

    # batch 1: ten calm values at t=60s.. (sd ~ 1)
    calm = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 11.2, 8.8, 10.0]
    spark.createDataFrame(_rows(calm, start_sec=60), SCHEMA).coalesce(
        1
    ).write.parquet(src_dir)

    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        zscore_stream(stream, threshold=3.0, min_n=5)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .outputMode("append")
        .start()
    )
    try:
        rows = _poll(spark, table, want=len(calm))
        assert len(rows) == len(calm)

        # batch 2: event times BEFORE batch 1 (t=0s, t=1s) — an inversion
        # the batch detectors would re-sort away but a monitor must score
        # on arrival: the 9.9 (earlier ts) folds first, then the 55.0
        # spike is judged by 11 accumulated calm points and flagged
        late = [9.9, 55.0]
        spark.createDataFrame(_rows(late, start_sec=0), SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src_dir)
        rows = _poll(spark, table, want=len(calm) + len(late))
        assert len(rows) == len(calm) + len(late)
        by_val = {r.value: r for r in rows}
        assert by_val[55.0].is_anomaly and by_val[55.0].z > 3.0
        assert not by_val[9.9].is_anomaly
    finally:
        q.stop()
