"""Sliding windows, stream-stream interval join, and watermarked dedup —
the §2.7 streaming categories absent in the reference."""

from __future__ import annotations

import datetime as dt
import time
import uuid

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from log_agent_spark.streaming.windows import (
    dedup_events_stream,
    sliding_counts,
    stream_stream_interval_join,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("key", StringType()),
        StructField("ts", TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(triples):
    return [(i, k, T0 + dt.timedelta(seconds=s)) for i, k, s in triples]


def _poll(spark, table, want, timeout=90):
    deadline = time.time() + timeout
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            return rows
        time.sleep(1)
    return rows


def _start(df, table, tmp_path, mode):
    return (
        df.writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{table}"))
        .trigger(processingTime="1 second")
        .outputMode(mode)
        .start()
    )


def test_sliding_window_overlap(spark, tmp_path):
    src = str(tmp_path / "src")
    table = f"slide_{uuid.uuid4().hex[:8]}"
    # one event at 00:00:45 → must appear in the [00:00:00, 00:01:00) AND
    # [00:00:30, 00:01:30) windows of a 1min/30s slide
    spark.createDataFrame(
        _rows([(1, "a", 45)]), SCHEMA
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = _start(sliding_counts(stream), table, tmp_path, "complete")
    try:
        rows = _poll(spark, table, want=2)
        starts = sorted(r.w_start for r in rows)
        assert starts == [
            T0,
            T0 + dt.timedelta(seconds=30),
        ], rows
        assert all(r.n == 1 for r in rows)
    finally:
        q.stop()


def test_session_collapse_bursts(spark, tmp_path):
    """Event-time sessionization (the declarative debounce twin): a burst
    with gaps < 3s collapses to one row; a quiet period opens a new
    session; keys never merge."""
    from log_agent_spark.streaming.windows import session_collapse

    src = str(tmp_path / "sess_src")
    table = f"sess_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        _rows([(1, "a", 0), (2, "a", 1), (3, "a", 2),   # one burst
               (4, "a", 10),                            # new session
               (5, "b", 1)]),                           # separate key
        SCHEMA,
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = _start(
        session_collapse(stream, key_col="key", gap="3 seconds"),
        table, tmp_path, "complete",
    )
    try:
        rows = _poll(spark, table, want=3)
        got = {
            (r.key, r.session_start, r.last_ts, r.n_events) for r in rows
        }
        assert got == {
            ("a", T0, T0 + dt.timedelta(seconds=2), 3),
            ("a", T0 + dt.timedelta(seconds=10), T0 + dt.timedelta(seconds=10), 1),
            ("b", T0 + dt.timedelta(seconds=1), T0 + dt.timedelta(seconds=1), 1),
        }, rows
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    table = f"ssj_{uuid.uuid4().hex[:8]}"
    # left@10s: right@20s joins (within 30s tolerance), right@70s does not;
    # key mismatch never joins
    spark.createDataFrame(
        _rows([(1, "a", 10), (2, "b", 10)]), SCHEMA
    ).write.mode("overwrite").parquet(lsrc)
    spark.createDataFrame(
        _rows([(101, "a", 20), (102, "a", 70), (103, "c", 20)]), SCHEMA
    ).write.mode("overwrite").parquet(rsrc)

    left = spark.readStream.schema(SCHEMA).parquet(lsrc)
    right = spark.readStream.schema(SCHEMA).parquet(rsrc)
    joined = stream_stream_interval_join(left, right, key="key")
    q = _start(joined, table, tmp_path, "append")
    try:
        rows = _poll(spark, table, want=1)
        pairs = {(r.event_id, r.event_id_r) for r in rows}
        assert pairs == {(1, 101)}, rows
    finally:
        q.stop()


def test_stream_stream_left_outer_join(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "lo_l"), str(tmp_path / "lo_r")
    table = f"ssl_{uuid.uuid4().hex[:8]}"
    # left 'a' matches; left 'b' never matches and must surface as a
    # null-padded row once the watermark passes b.ts + tolerance.
    spark.createDataFrame(
        _rows([(1, "a", 10), (2, "b", 10)]), SCHEMA
    ).write.mode("overwrite").parquet(lsrc)
    spark.createDataFrame(_rows([(101, "a", 20)]), SCHEMA).write.mode(
        "overwrite"
    ).parquet(rsrc)

    left = spark.readStream.schema(SCHEMA).parquet(lsrc)
    right = spark.readStream.schema(SCHEMA).parquet(rsrc)
    joined = stream_stream_interval_join(left, right, key="key", how="left_outer")
    q = _start(joined, table, tmp_path, "append")
    try:
        rows = _poll(spark, table, want=1)
        assert {(r.event_id, r.event_id_r) for r in rows} >= {(1, 101)}
        # Advance BOTH watermarks far past b.ts + tolerance; the late pair
        # also joins, proving state eviction didn't break matching.
        spark.createDataFrame(_rows([(3, "z", 500)]), SCHEMA).write.mode(
            "append"
        ).parquet(lsrc)
        spark.createDataFrame(_rows([(103, "z", 500)]), SCHEMA).write.mode(
            "append"
        ).parquet(rsrc)
        rows = _poll(spark, table, want=3, timeout=120)
        pairs = {(r.event_id, r.event_id_r) for r in rows}
        assert (2, None) in pairs, pairs
        assert (1, 101) in pairs and (3, 103) in pairs, pairs
    finally:
        q.stop()


def test_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "dsrc")
    table = f"ddw_{uuid.uuid4().hex[:8]}"
    # same key twice within the horizon → one survivor; distinct key kept
    spark.createDataFrame(
        _rows([(1, "a", 10), (2, "a", 15), (3, "b", 12)]), SCHEMA
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = _start(dedup_events_stream(stream, ["key"]), table, tmp_path, "append")
    try:
        rows = _poll(spark, table, want=2)
        assert {r.key for r in rows} == {"a", "b"}, rows
        assert len(rows) == 2, rows
    finally:
        q.stop()


def test_dedup_state_survives_restart_mid_window(spark, tmp_path):
    """Restart-mid-window recovery (VERDICT r6 stretch): the dedup state
    store is checkpointed, so a duplicate key arriving in the query's
    SECOND life — within the watermark horizon of its first-life original
    — must still be dropped, and a genuinely new key must still pass.
    File sink (not memory: a memory table restarts empty) accumulates
    output across both lives."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "restart_src")
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")

    def run_until(expect_rows):
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            dedup_events_stream(stream, ["key"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .outputMode("append")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline:
                try:
                    if spark.read.schema(SCHEMA).parquet(out).count() >= expect_rows:
                        break
                except Exception:
                    pass  # sink dir not created yet
                time.sleep(1)
        finally:
            q.stop()

    # first life: two distinct keys, seconds apart (1 min watermark — the
    # window is still open when the query dies)
    spark.createDataFrame(
        _rows([(1, "a", 10), (2, "b", 12)]), SCHEMA
    ).write.mode("overwrite").parquet(src)
    run_until(expect_rows=2)

    # while down: a DUPLICATE of key 'a' inside the horizon + a new key
    spark.createDataFrame(
        _rows([(3, "a", 11), (4, "c", 13)]), SCHEMA
    ).write.mode("append").parquet(src)
    run_until(expect_rows=3)

    got = spark.read.schema(SCHEMA).parquet(out).collect()
    assert sorted(r.event_id for r in got) == [1, 2, 4], got
    assert {r.key for r in got} == {"a", "b", "c"}
    assert spark.read.schema(SCHEMA).parquet(out).filter(
        F.col("event_id") == 3
    ).count() == 0


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static dimension join: each event picks up its dim attrs;
    keys missing from the dim survive with nulls (left join)."""
    from log_agent_spark.streaming.windows import enrich_with_dimension

    src = str(tmp_path / "enrich_src")
    table = f"enrich_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(
        _rows([(1, "a", 0), (2, "b", 1), (3, "zz", 2)]), SCHEMA
    ).write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], ["key", "label"]
    )

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = _start(
        enrich_with_dimension(stream, dim, key="key"),
        table, tmp_path, "append",
    )
    try:
        rows = _poll(spark, table, want=3)
        got = {(r.key, r.label) for r in rows}
        assert got == {("a", "alpha"), ("b", "beta"), ("zz", None)}, rows
    finally:
        q.stop()
