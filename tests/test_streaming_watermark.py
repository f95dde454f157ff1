"""Event-time tumbling window + watermark over a streaming file source.

Append mode only emits a window once the watermark (max event time − delay)
passes its end — so the test feeds a second batch of later events to close
the first minute's window, then asserts the finalized count."""

from __future__ import annotations

import datetime as dt
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)


def _rows(ids_seconds):
    return [(i, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)) for i, s in ids_seconds]


def test_watermark_finalizes_closed_windows(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    table = f"win_{uuid.uuid4().hex[:8]}"

    # batch 1: four events inside minute 0, one late-ish at 00:00:50
    spark.createDataFrame(
        _rows([(1, 5), (2, 10), (3, 40), (4, 50)]), SCHEMA
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(table)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .outputMode("append")
        .start()
    )
    try:
        # let batch 1 set the watermark to 00:00:50 - 10s = 00:00:40 —
        # minute-0 window [00:00, 01:00) is NOT finalized yet
        deadline = time.time() + 60
        while time.time() < deadline and not q.recentProgress:
            time.sleep(1)
        assert spark.sql(f"SELECT * FROM {table}").count() == 0

        # batch 2: events in minute 2 push the watermark past 01:00 —
        # the first window must now be emitted with ALL FIVE minute-0 events
        # counted (none dropped: they were never later than the watermark)
        spark.createDataFrame(
            _rows([(10, 130), (11, 140)]), SCHEMA
        ).write.mode("append").parquet(src)

        rows = {}
        deadline = time.time() + 90
        while time.time() < deadline:
            rows = {r.w_start: r.n for r in spark.sql(f"SELECT * FROM {table}").collect()}
            if rows:
                break
            time.sleep(1)
        assert rows.get(dt.datetime(2024, 1, 1, 0, 0, 0)) == 4, rows
        # minute-2 window still open (watermark hasn't passed 00:03:00)
        assert dt.datetime(2024, 1, 1, 0, 2, 0) not in rows
    finally:
        q.stop()
