"""Avro Object Container File source/sink (sources/avro_ocf.py).

Three layers of proof:
  1. codec unit tests — zigzag varint and per-type encode∘decode identity,
     including the negative-count array-block form the spec allows;
  2. a hand-built byte-level golden: a file assembled independently of the
     writer (explicit header bytes) must decode correctly, so the reader
     is not merely the writer's inverse;
  3. Spark round trips through the registered DataSource — all supported
     types, deflate and null codecs, multi-partition layout, overwrite
     semantics, and schema inference from the embedded writer schema.
"""

from __future__ import annotations

import datetime as dt
import io
import json
import os

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from log_agent_spark.sources.avro_ocf import (
    MAGIC,
    AvroOcfDataSource,
    _dec_long,
    _decode_value,
    _enc_long,
    avro_to_spark_schema,
    iter_ocf,
    spark_to_avro_schema,
    write_ocf,
)


def _zz(v: int) -> bytes:
    out = bytearray()
    _enc_long(v, out)
    return bytes(out)


def test_zigzag_varint_roundtrip():
    for v in [0, -1, 1, -2, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)]:
        assert _dec_long(io.BytesIO(_zz(v))) == v


def test_zigzag_known_bytes():
    # spec examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    assert _zz(0) == b"\x00"
    assert _zz(-1) == b"\x01"
    assert _zz(1) == b"\x02"
    assert _zz(-64) == b"\x7f"
    assert _zz(64) == b"\x80\x01"


def test_array_negative_count_block_decodes():
    # spec: array blocks may carry a NEGATIVE count followed by a byte size
    payload = _zz(-2) + _zz(2) + _zz(7) + _zz(9) + _zz(0)
    got = _decode_value({"type": "array", "items": "long"}, io.BytesIO(payload))
    assert got == [7, 9]


def test_handbuilt_file_decodes(tmp_path):
    # assemble an OCF by hand (null codec, one block, two records) so the
    # reader is proven against the SPEC, not against write_ocf
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
        ],
    }
    sj = json.dumps(schema).encode()
    sync = bytes(range(16))
    head = bytearray(MAGIC)
    head += _zz(2)  # 2 metadata entries
    for k, v in ((b"avro.schema", sj), (b"avro.codec", b"null")):
        head += _zz(len(k)) + k + _zz(len(v)) + v
    head += _zz(0) + sync
    rec1 = _zz(1) + _zz(1) + _zz(2) + "hi".encode()  # id=1, union branch 1
    rec2 = _zz(2) + _zz(0)  # id=2, null name
    block = rec1 + rec2
    path = str(tmp_path / "hand.avro")
    with open(path, "wb") as f:
        f.write(head + _zz(2) + _zz(len(block)) + block + sync)
    assert list(iter_ocf(path)) == [(1, "hi"), (2, None)]


def test_write_ocf_multiblock_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "s", "type": "string"}],
    }
    rows = [(i, f"row-{i}" * 10) for i in range(5000)]
    path = str(tmp_path / "multi.avro")
    # tiny block size forces many blocks + sync markers
    n = write_ocf(path, schema, rows, codec="deflate", block_bytes=1 << 12)
    assert n == 5000
    assert list(iter_ocf(path)) == rows


ALL_TYPES_SCHEMA = StructType(
    [
        StructField("s", StringType(), True),
        StructField("l", LongType(), True),
        StructField("i", IntegerType(), True),
        StructField("d", DoubleType(), True),
        StructField("b", BooleanType(), True),
        StructField("raw", BinaryType(), True),
        StructField("ts", TimestampType(), True),
        StructField("day", DateType(), True),
        StructField("arr", ArrayType(LongType()), True),
    ]
)


def test_schema_mapping_roundtrip():
    avro = spark_to_avro_schema(ALL_TYPES_SCHEMA)
    back = avro_to_spark_schema(avro)
    assert back == ALL_TYPES_SCHEMA


def test_spark_all_types_roundtrip(spark, tmp_path):
    spark.dataSource.register(AvroOcfDataSource)
    rows = [
        Row(
            s="héllo ✓",
            l=2**60,
            i=-42,
            d=3.5,
            b=True,
            raw=b"\x00\xffbin",
            ts=dt.datetime(2024, 3, 1, 12, 30, 45, 123456),
            day=dt.date(2024, 2, 29),
            arr=[1, 2, 3],
        ),
        Row(s=None, l=None, i=None, d=None, b=None, raw=None, ts=None,
            day=None, arr=[]),
    ]
    df = spark.createDataFrame(rows, ALL_TYPES_SCHEMA)
    out = str(tmp_path / "all_types")
    df.write.format("avro_ocf").mode("overwrite").save(out)
    back = spark.read.format("avro_ocf").schema(ALL_TYPES_SCHEMA).load(out)
    assert sorted(back.collect(), key=lambda r: (r.s is None, r.s or "")) == \
        sorted(rows, key=lambda r: (r.s is None, r.s or ""))


def test_spark_partition_layout_and_infer(spark, tmp_path):
    spark.dataSource.register(AvroOcfDataSource)
    out = str(tmp_path / "parts")
    df = spark.range(1000).repartition(4).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    df.write.format("avro_ocf").mode("append").option("codec", "deflate").save(out)
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 4  # one OCF file per input partition
    # schema inference from the embedded writer schema (no .schema() call)
    back = spark.read.format("avro_ocf").load(out)
    assert [f.name for f in back.schema.fields] == ["id", "val"]
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 499500


def test_spark_overwrite_clears_stale_parts(spark, tmp_path):
    spark.dataSource.register(AvroOcfDataSource)
    out = str(tmp_path / "ow")
    spark.range(100).repartition(8).write.format("avro_ocf").mode("append").save(out)
    assert len(os.listdir(out)) == 8
    spark.range(10).repartition(1).write.format("avro_ocf").mode(
        "overwrite"
    ).save(out)
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 1  # stale part files removed
    assert spark.read.format("avro_ocf").load(out).count() == 10


def test_schema_resolution_reorder_prune_extend(spark, tmp_path):
    # Avro schema resolution: the reader schema is matched by NAME against
    # each file's writer schema — reordering, pruning, and extending must
    # all produce correctly-aligned columns, never positional garbage.
    spark.dataSource.register(AvroOcfDataSource)
    out = str(tmp_path / "resolve")
    df = spark.range(3).select(
        F.col("id"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        (F.col("id") * 2.5).alias("score"),
    )
    df.coalesce(1).write.format("avro_ocf").mode("append").save(out)

    reordered = StructType(
        [
            StructField("score", DoubleType(), True),
            StructField("id", LongType(), True),
        ]
    )
    got = {
        r.id: r.score
        for r in spark.read.format("avro_ocf").schema(reordered).load(out).collect()
    }
    assert got == {0: 0.0, 1: 2.5, 2: 5.0}

    extended = StructType(
        [
            StructField("name", StringType(), True),
            StructField("missing_col", StringType(), True),
        ]
    )
    rows = spark.read.format("avro_ocf").schema(extended).load(out).collect()
    assert sorted(r.name for r in rows) == ["n0", "n1", "n2"]
    assert all(r.missing_col is None for r in rows)


def test_empty_partitions_write_header_only_files(spark, tmp_path):
    # 1 row over 8 partitions -> 7 header-only OCF files; the reader must
    # treat them as empty, not corrupt, and schema inference still works
    spark.dataSource.register(AvroOcfDataSource)
    out = str(tmp_path / "mostly_empty")
    spark.range(1).repartition(8).write.format("avro_ocf").mode("append").save(out)
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 8
    back = spark.read.format("avro_ocf").load(out)
    assert back.count() == 1


def test_corrupt_sync_marker_raises(tmp_path):
    schema = {"type": "record", "name": "t",
              "fields": [{"name": "id", "type": "long"}]}
    path = str(tmp_path / "corrupt.avro")
    write_ocf(path, schema, [(1,), (2,)])
    data = bytearray(open(path, "rb").read())
    data[-1] ^= 0xFF  # flip last sync byte
    with open(path, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError, match="sync marker"):
        list(iter_ocf(path))
