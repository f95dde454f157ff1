"""Avro binary body for the Kafka value — the reference's dormant
schema-registry path, completed (SURVEY.md §2.4 M14).

The reference ships a goavro ``BinaryFromNative`` call commented out
(watchdog/handler/kafka.go:373-406) against the 13-field record schema at
kafka.go:34-93 (declared Connect-style there; the Avro twin is the same
flat field list). This module hand-rolls the Avro binary encoding — no
codec jar, no external lib:

- record   = concatenation of its fields in schema order
- string   = zigzag-varint byte length + UTF-8 bytes
- long     = zigzag varint
- boolean  = single byte 0x00/0x01

Composed with ``envelope.confluent_frame`` (magic 0x00 + 4-byte BE schema
id, kafka.go:449-473) this reproduces the full Confluent wire message the
dormant path would have produced.

Execution shape: wire encoding is inherently per-row byte emission, so
the column form is an Arrow-batched pandas UDF over the payload struct —
the sink-side slow path, deliberately; the default JSON-envelope path
(envelope.py) stays all-JVM. At 100 TB the encoder is a narrow map over
input splits: no shuffle, no state, parallelism = splits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

# Field order follows the reference's record schema (kafka.go:34-93):
# NOTE content sits between modify_time and compress there, unlike the
# Connect JSON payload order.
AVRO_FIELDS: list[tuple[str, str]] = [
    ("file_date", "string"),
    ("file_time", "long"),
    ("folder", "string"),
    ("pack", "string"),
    ("name", "string"),
    ("size", "long"),
    ("modify_time", "long"),
    ("content", "string"),
    ("compress", "boolean"),
    ("compress_size", "long"),
    ("checksum", "string"),
    ("host", "string"),
    ("folder_time", "long"),
]

AVRO_RECORD_SCHEMA = {
    "type": "record",
    "name": "dcagent_value",
    "fields": [{"name": n, "type": t} for n, t in AVRO_FIELDS],
}


def _zigzag_varint(v: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_avro_record(values: dict) -> bytes:
    """goavro-compatible binary encoding of one 13-field record."""
    out = bytearray()
    for fname, ftype in AVRO_FIELDS:
        v = values[fname]
        if ftype == "string":
            raw = ("" if v is None else str(v)).encode("utf-8")
            out += _zigzag_varint(len(raw)) + raw
        elif ftype == "long":
            out += _zigzag_varint(int(v))
        else:  # boolean
            out.append(1 if v else 0)
    return bytes(out)


@pandas_udf(BinaryType())
def _avro_encode_udf(payload: pd.DataFrame) -> pd.Series:
    return payload.apply(
        lambda row: encode_avro_record(row.to_dict()), axis=1
    )


def avro_value(payload: Column) -> Column:
    """Avro binary body of the wire payload struct (Arrow-batched)."""
    return _avro_encode_udf(payload)
