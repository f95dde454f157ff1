"""Streaming OOO-depth tracker (streaming/ooo_tws.py): after replaying the
events fixture split into TWO arrival-ordered micro-batches, the emitted
per-event lateness stream aggregated per event_type must equal the BATCH
watermark-sizing audit (plans/events.py events_ooo_depth) over the same
rows — the running max carried across the micro-batch boundary scores
every arrival exactly as the batch window replay does."""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from log_agent_spark.streaming.ooo_tws import HAS_TWS_DEPS, ooo_depth_stream

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not HAS_TWS_DEPS,
    reason="transformWithState Python runner requires google.protobuf",
)


def _pin_batch_order(src_dir: str) -> None:
    """FileStreamSource orders pending files by mtime ONLY (no path
    tiebreak); sequential writes can collide on coarse-granularity
    filesystems, so pin half0's files strictly older than half1's."""
    now = time.time()
    for sub, age in (("half0", 60.0), ("half1", 0.0)):
        d = os.path.join(src_dir, sub)
        for name in os.listdir(d):
            p = os.path.join(d, name)
            os.utime(p, (now - age, now - age))


def test_streaming_ooo_depth_matches_batch(spark, tmp_path, rocksdb_state_store):
    src_dir = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    table = f"tws_ooo_{uuid.uuid4().hex[:8]}"

    # the planted-inversion view, NOT the raw table: the batch audit plants
    # deterministic late arrivals (the raw feed is fully ordered), so the
    # streamed replay must carry the same rows for the parity to hold —
    # and the plants give the cross-batch state real non-zero work
    from log_agent_spark.plans.events import ooo_planted_events

    e = ooo_planted_events(spark, SF_DIR)
    n_total = e.count()
    mid = e.agg(F.percentile_approx("event_id", 0.5)).first()[0]
    # arrival-ordered split: batch 0 = earlier arrivals, batch 1 = later —
    # the concatenation preserves global event_id arrival order, so the
    # running max MUST survive the micro-batch boundary to score half1
    e.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(
        src_dir + "/half0"
    )
    e.filter(F.col("event_id") > mid).coalesce(1).write.parquet(
        src_dir + "/half1"
    )
    _pin_batch_order(src_dir)

    from log_agent_spark.plans.events import q_ooo_depth

    expected = {
        r.event_type: r for r in q_ooo_depth(spark, SF_DIR).collect()
    }

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, ts_ms long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/half*")
    )
    q = (
        ooo_depth_stream(stream)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # no timers (timeMode None) — terminates
        got = {
            r.event_type: r
            for r in spark.sql(
                f"""SELECT event_type,
                           COUNT(*) AS n_events,
                           SUM(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END)
                             AS n_late,
                           MAX(late_ms) AS max_late_ms,
                           SUM(late_ms) AS late_mass_ms
                    FROM {table} GROUP BY event_type"""
            ).collect()
        }
        assert sum(r.n_events for r in got.values()) == n_total
        assert set(got) == set(expected)
        for et, exp in expected.items():
            assert got[et].n_events == exp.n_events, et
            assert got[et].n_late == exp.n_late, et
            assert got[et].max_late_ms == exp.max_late_ms, et
            assert got[et].late_mass_ms == exp.late_mass_ms, et
    finally:
        q.stop()


def test_streaming_ooo_depth_scores_cross_batch_inversion(
    spark, tmp_path, rocksdb_state_store
):
    """The discriminating cases the ordered fixture cannot produce: a
    user's running max is set in micro-batch 0 and a LATE event arrives
    in micro-batch 1 (carried state must score it), a same-batch
    inversion (in-batch fold must score it), and a NULL event-time
    (scored NULL like the batch twin, without killing the query or
    disturbing the running max)."""
    import datetime as dt

    src_dir = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    table = f"tws_ooo_{uuid.uuid4().hex[:8]}"

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)

    def ms(sec):
        return int((t0 + dt.timedelta(seconds=sec)).timestamp() * 1000)

    # batch 0: user 7 reaches ts=+100 s; user 8 has an IN-batch inversion
    batch0 = [
        (7, 1, "click", ms(0)),
        (7, 2, "click", ms(100)),
        (8, 3, "view", ms(50)),
        (8, 4, "view", ms(20)),   # 30 s late within batch 0
    ]
    # batch 1: user 7's event is 40 s behind the max carried from batch 0;
    # user 8 gets a NULL event-time then an on-time event whose lateness
    # must be judged against ms(50), not the NULL
    batch1 = [
        (7, 5, "click", ms(60)),  # late vs ms(100) by 40 s — cross-batch
        (7, 6, "click", ms(120)),
        (8, 7, "view", None),     # NULL ts: late_ms NULL, max untouched
        (8, 8, "view", ms(70)),
    ]
    schema = "user_id long, event_id long, event_type string, ts_ms long"
    spark.createDataFrame(batch0, schema).coalesce(1).write.parquet(
        src_dir + "/half0"
    )
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        src_dir + "/half1"
    )
    _pin_batch_order(src_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/half*")
    )
    q = (
        ooo_depth_stream(stream)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        late = {
            r.event_id: r.late_ms
            for r in spark.sql(f"SELECT * FROM {table}").collect()
        }
        assert late == {
            1: 0,
            2: 0,
            3: 0,
            4: 30000,    # in-batch inversion
            5: 40000,    # cross-batch: state carried the ms(100) max
            6: 0,
            7: None,     # NULL event-time scored NULL, query alive
            8: 0,        # on time vs the ms(50) max the NULL didn't disturb
        }
    finally:
        q.stop()


def test_streaming_ooo_depth_all_null_first_batch(
    spark, tmp_path, rocksdb_state_store
):
    """A user whose FIRST-ever micro-batch contains only NULL event-times
    must not poison later batches: storing NULL state would read back as
    NaN through the Arrow hop and propagate into every later max() and
    subtraction. After the NULL-only batch, real events must score as if
    the user were brand new."""
    import datetime as dt

    src_dir = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    table = f"tws_ooo_{uuid.uuid4().hex[:8]}"

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)

    def ms(sec):
        return int((t0 + dt.timedelta(seconds=sec)).timestamp() * 1000)

    # batch 0: user 9's ONLY rows are NULL-ts
    batch0 = [(9, 1, "view", None), (9, 2, "view", None)]
    # batch 1: first real timestamps — must behave like a fresh user
    # (first real event scores 0, the inversion scores against ms(80))
    batch1 = [(9, 3, "view", ms(80)), (9, 4, "view", ms(30))]
    schema = "user_id long, event_id long, event_type string, ts_ms long"
    spark.createDataFrame(batch0, schema).coalesce(1).write.parquet(
        src_dir + "/half0"
    )
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        src_dir + "/half1"
    )
    _pin_batch_order(src_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/half*")
    )
    q = (
        ooo_depth_stream(stream)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        late = {
            r.event_id: r.late_ms
            for r in spark.sql(f"SELECT * FROM {table}").collect()
        }
        assert late == {1: None, 2: None, 3: 0, 4: 50000}
    finally:
        q.stop()
