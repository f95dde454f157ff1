"""Kafka wire-format round trip: to_kafka_records → from_kafka_records must
be lossless (at the wire's declared precision: epoch millis, hex blob), on
both batch and streaming DataFrames. No broker needed — the envelope is the
contract, the transport is Kafka's problem."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from log_agent_spark.functions.envelope import to_kafka_records
from log_agent_spark.sources.kafka_source import from_kafka_records

COLS = [
    "file_date", "file_time", "folder", "pack", "name", "size",
    "modify_time", "content", "compress", "compress_size", "checksum",
    "host", "folder_time",
]


def _logfile_rows(spark):
    t = dt.datetime(2017, 6, 7, 16, 15, 42, 797000)  # ms-aligned (wire is ms)
    d = dt.date(2017, 6, 7)
    rows = [
        (d, t, "LOUP/x", "", "big.log", 2400, t, b"\x1f\x8b payload", True,
         40, "aa" * 16, "h1", t),
        # empty content → wire '0x' → back to b'' (kafka.go:323-325)
        (d, t, "flat", "", "empty.dat", 0, t, b"", False, 0, "d4" * 16,
         "h1", t),
        # archive member: pack set, GBK-decoded member name survives JSON
        (d, t, "LOUP/x", "FLOWLOG.zip", "中文名.txt", 17, t, b"gbk named content",
         False, 17, "bb" * 16, "h1", t),
    ]
    return spark.createDataFrame(rows, COLS)


def test_round_trip_batch(spark):
    src = _logfile_rows(spark)
    back = from_kafka_records(to_kafka_records(src))
    a = sorted(src.collect(), key=lambda r: r.name)
    b = sorted(back.collect(), key=lambda r: r.name)
    assert len(a) == len(b) == 3
    for ra, rb in zip(a, b):
        for c in COLS:
            va, vb = getattr(ra, c), getattr(rb, c)
            if c == "content":
                assert bytes(va) == bytes(vb), (c, va, vb)
            else:
                assert va == vb, (c, va, vb)


def test_key_uniqueness_for_archive_members(spark):
    recs = to_kafka_records(_logfile_rows(spark))
    keys = [r.key for r in recs.collect()]
    assert len(set(keys)) == 3
    assert "LOUP/x/FLOWLOG.zip/中文名.txt" in keys  # kafka.go:359-365
    assert "flat/empty.dat" in keys  # empty pack skipped, no '//'


def test_round_trip_streaming(spark, tmp_path):
    """The decode path must be streaming-legal (stateless projections only):
    wire records parquet dir → readStream → from_kafka_records → memory sink."""
    src_dir = str(tmp_path / "wire")
    to_kafka_records(_logfile_rows(spark)).write.parquet(src_dir)
    wire_schema = spark.read.parquet(src_dir).schema

    stream = spark.readStream.schema(wire_schema).parquet(src_dir)
    q = (
        from_kafka_records(stream)
        .writeStream.format("memory")
        .queryName("kafka_decode")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    out = spark.sql("select * from kafka_decode")
    assert out.count() == 3
    got = {r.name: bytes(r.content) for r in out.collect()}
    assert got["empty.dat"] == b""
    assert got["中文名.txt"] == b"gbk named content"


def test_dead_letter_rows_parse_to_null(spark):
    bad = spark.createDataFrame(
        [("k", "not json at all"), ("k2", '{"payload": {"file_time": 1}}')],
        "key string, value string",
    )
    out = from_kafka_records(bad)
    rows = out.collect()
    # malformed → NULL file_time (dead-letter filter); partial → parsed field
    assert rows[0].file_time is None
    assert rows[1].file_time == dt.datetime(1970, 1, 1, 0, 0, 0, 1000)
