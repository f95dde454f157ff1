"""End-to-end hot path (SURVEY.md §3.2): file event source → debounce (T1)
→ keep-latest dedup (T3) → per-biz transform (P4) → priority multi-sink
(K6) → post-success state commit (K8), all through run_event_pipeline."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from log_agent_spark.schemas import EVENT_SCHEMA
from log_agent_spark.sinks.multi import MultiSink, Sink
from log_agent_spark.streaming.pipeline import run_event_pipeline


def _event(path, op, sec):
    t = dt.datetime(2024, 1, 1, 0, 0, sec)
    return (path, op, "BSI", "/root", t, t, False)


def test_pipeline_quarantine_branch(spark, tmp_path):
    """P4 CheckFile failure → dead-letter, not the sink chain."""
    src = str(tmp_path / "events_q")
    spark.createDataFrame(
        [_event("/ok", "CREATE", 1), _event("/bad", "CREATE", 1)], EVENT_SCHEMA
    ).write.parquet(src)

    delivered: list[str] = []
    quarantined: list[str] = []
    chain = MultiSink(
        [Sink(name="rec", write=lambda df: delivered.extend(r.path for r in df.collect()))]
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = run_event_pipeline(
        stream,
        chain,
        validate=lambda df: df.withColumn("_valid", ~F.col("path").startswith("/bad")),
        dead_letter=lambda df: quarantined.extend(r.path for r in df.collect()),
        debounce_ms=None,  # T7 bypass
        checkpoint_dir=str(tmp_path / "ckpt_q"),
        trigger="1 second",
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not (delivered and quarantined):
            time.sleep(1)
        assert delivered == ["/ok"]
        assert quarantined == ["/bad"]
    finally:
        q.stop()


def test_config_driven_pipeline_from_file_events(spark, tmp_path):
    """AutoInit parity: ini-style BizConfig → custom file_events source →
    standing pipeline, end to end on a real directory."""
    from log_agent_spark.config import BizConfig, build_stream_pipeline, read_file_events

    watch = tmp_path / "watched"
    watch.mkdir()
    (watch / "a.log").write_bytes(b"hello")
    (watch / "skip.tmp").write_bytes(b"nope")

    cfg = BizConfig(
        name="SPI.TEST", watch=str(watch), patterns=r"\.log$", debounce_ms=0
    )
    delivered: list[tuple] = []
    chain = MultiSink(
        [Sink(name="rec", write=lambda df: delivered.extend(
            (r.path, r.op, r.biz) for r in df.collect()))]
    )
    q = build_stream_pipeline(
        read_file_events(spark, cfg),
        cfg,
        chain,
        checkpoint_dir=str(tmp_path / "ckpt_cfg"),
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not delivered:
            time.sleep(1)
        assert delivered == [(str(watch / "a.log"), "CREATE", "SPI")]
    finally:
        q.stop()


def test_event_pipeline_end_to_end(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.createDataFrame(
        [
            _event("/a", "CREATE", 1),
            _event("/a", "WRITE", 2),
            _event("/a", "WRITE", 3),
            _event("/b", "CREATE", 1),
        ],
        EVENT_SCHEMA,
    ).write.parquet(src)

    seen: list[list] = []
    committed: list[int] = []
    order: list[str] = []

    def record_sink(df):
        rows = df.collect()
        if rows:
            order.append("sink")
            seen.append(rows)

    def commit(df):
        n = df.count()
        if n:
            order.append("commit")
            committed.append(n)

    chain = MultiSink(
        [Sink(name="rec", write=record_sink, priority=5)], on_success=commit
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = run_event_pipeline(
        stream,
        chain,
        transform=lambda df: df.withColumn("biz_u", F.upper("biz")),
        debounce_ms=1000,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger="1 second",
    )
    try:
        deadline = time.time() + 120
        # Poll on `committed` (the LAST step of the batch callback), not
        # `seen` — asserting between the sink write and the commit hook
        # races q.stop() against the in-flight count() job.
        while time.time() < deadline and sum(committed) < 2:
            time.sleep(1)
        rows = {r.path: r for batch in seen for r in batch}
        # T1: the /a storm collapsed to its last event; /b passed through
        assert set(rows) == {"/a", "/b"}
        assert rows["/a"].op == "WRITE"
        assert rows["/a"].ts == dt.datetime(2024, 1, 1, 0, 0, 3)
        # P4: transform applied inside the batch
        assert rows["/a"].biz_u == "BSI"
        # K8: commit ran after the sink, with the same row counts
        assert order and order[0] == "sink"
        assert sum(committed) == sum(len(r) for r in seen)
    finally:
        q.stop()
