"""Streaming HLL on transformWithStateInPandas (streaming/hll_tws.py):
after replaying the events fixture split across TWO micro-batches, each
key's final streaming estimate must equal the BATCH first-principles HLL
(plans/events.py q_hll_report) over the same rows — the mergeable-sketch
property across the micro-batch boundary, register-for-register."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from log_agent_spark.sources.tables import load_table
from log_agent_spark.streaming.hll_tws import HAS_TWS_DEPS, hll_stream

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not HAS_TWS_DEPS,
    reason="transformWithState Python runner requires google.protobuf",
)


def test_streaming_hll_matches_batch(spark, tmp_path, rocksdb_state_store):
    src_dir = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    table = f"tws_hll_{uuid.uuid4().hex[:8]}"

    e = load_table(spark, SF_DIR, "events").select("event_type", "event_id")
    # two parquet files -> two micro-batches under maxFilesPerTrigger=1,
    # so the register state must survive and merge across batches
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src_dir + "/half0"
    )
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src_dir + "/half1"
    )

    from log_agent_spark.plans.events import q_hll_report

    expected = {
        r.event_type: (r.hll_est, r.v_zero)
        for r in q_hll_report(spark, SF_DIR).collect()
    }
    n_total = e.count()

    stream = (
        spark.readStream.schema("event_type string, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/half*")
    )
    q = (
        hll_stream(stream)
        .writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()  # no timers (timeMode None) — terminates
        rows = spark.sql(
            f"SELECT * FROM {table} ORDER BY n_seen"
        ).collect()
        # freshest update per key = max cumulative n_seen
        latest = {r.event_type: r for r in rows}
        assert set(latest) == set(expected)
        assert sum(r.n_seen for r in latest.values()) == n_total
        for et, (est, vz) in expected.items():
            assert latest[et].hll_est == est, et  # bit-identical estimate
            assert latest[et].v_zero == vz, et
        # at least one key must have been updated in BOTH batches, or the
        # cross-batch merge was never exercised
        assert len(rows) > len(latest)
    finally:
        q.stop()
